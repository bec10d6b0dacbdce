"""Synchronous full-tree sweep engine: validity, cache/cost audits,
disjoint-application correctness and determinism (IM + FW variants)."""

import functools as fts
import math
import operator as op

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tnco_tpu.bitset import Bitset
from tnco_tpu.ctree import ContractionTree
from tnco_tpu.kernels import sa_batched as sb
from tnco_tpu.kernels import sa_fullsweep as sfs
from tnco_tpu.kernels.sa_infinite import SweepConfig, compute_lcc
from tnco_tpu.ops import bitops
from tnco_tpu.testing.utils import (assert_batches_identical,
                                    generate_random_tensors,
                                    is_valid_contraction_tree)
from tnco_tpu.utils.tn import get_random_contraction_path


def _setup(rng, random_seed, n_replicas=6):
    ts_inds, output_inds, dims = generate_random_tensors(rng,
                                                         n_output_inds=2)
    order = tuple(dict.fromkeys(x for xs in ts_inds for x in xs))
    ctrees = []
    for r in range(n_replicas):
        paths = get_random_contraction_path(ts_inds, output_inds,
                                            merge_paths=False,
                                            seed=random_seed + r)
        (path,) = [p for p in paths if p]
        ctrees.append(
            ContractionTree(path, ts_inds, dims, output_inds=output_inds,
                            check_shared_inds=True, inds_order=order))
    return ctrees, ts_inds, output_inds, dims


def test_fullsweep_validity_and_audits(rng, random_seed):
    ctrees, ts_inds, output_inds, dims = _setup(rng, random_seed)
    template = ctrees[0]
    n_lanes = template.inds_array.shape[1]
    cfg = SweepConfig(n_leaves=template.n_leaves, n_lanes=n_lanes)
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    b = len(ctrees)
    batch = sb.init_batch(ctrees, list(range(b)), np.asarray(log2d))
    betas = jnp.linspace(0.0, 10.0, 50, dtype=jnp.float32)

    out, metrics = sfs.run_fullsweep(batch, betas, log2d_w32, cfg)
    ni = len(template) - template.n_leaves
    assert int(metrics['moves']) == 50 * ni * b
    assert 0 < int(metrics['applied']) <= int(metrics['moves'])

    for i in range(b):
        nodes = np.stack([
            np.asarray(out.c0[:, i]),
            np.asarray(out.c1[:, i]),
            np.asarray(out.par[:, i])
        ], axis=1)
        tree = template.replace_arrays(nodes, np.asarray(out.inds[..., i]))
        is_valid_contraction_tree(tree, ts_inds, output_inds, dims)

        lcc_ref = np.asarray(
            compute_lcc(jnp.asarray(nodes), out.inds[..., i],
                        jnp.asarray(log2d)))
        got = np.asarray(out.lcc[:, i])
        fin = np.isfinite(lcc_ref)
        np.testing.assert_allclose(got[fin], lcc_ref[fin], atol=1e-4)

        from tnco_tpu.kernels.sa_infinite import compute_hyper
        hyper_ref = compute_hyper(jnp.asarray(nodes), out.inds[..., i])
        np.testing.assert_array_equal(np.asarray(out.hyper[..., i]),
                                      np.asarray(hyper_ref))

        mnodes = np.stack([
            np.asarray(out.min_c0[:, i]),
            np.asarray(out.min_c1[:, i]),
            np.asarray(out.min_par[:, i])
        ], axis=1)
        mtree = template.replace_arrays(mnodes,
                                        np.asarray(out.min_inds[..., i]))
        is_valid_contraction_tree(mtree, ts_inds, output_inds, dims)
        exact = math.log2(mtree.total_cost_exact())
        assert float(out.min_log2_total[i]) == pytest.approx(exact,
                                                             abs=1e-3)


def test_fullsweep_deterministic(rng, random_seed):
    ctrees, *_ = _setup(rng, random_seed, n_replicas=4)
    template = ctrees[0]
    n_lanes = template.inds_array.shape[1]
    cfg = SweepConfig(n_leaves=template.n_leaves, n_lanes=n_lanes)
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    batch = sb.init_batch(ctrees, list(range(4)), np.asarray(log2d))
    betas = jnp.linspace(0.0, 10.0, 30, dtype=jnp.float32)

    ref, mref = sfs.run_fullsweep(batch, betas, log2d_w32, cfg)
    got, mgot = sfs.run_fullsweep(batch, betas, log2d_w32, cfg)
    assert int(mref['applied']) == int(mgot['applied'])
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fullsweep_greedy_monotone(rng, random_seed):
    ctrees, *_ = _setup(rng, random_seed, n_replicas=4)
    template = ctrees[0]
    n_lanes = template.inds_array.shape[1]
    cfg = SweepConfig(n_leaves=template.n_leaves, n_lanes=n_lanes,
                      prob_kind='greedy')
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    batch = sb.init_batch(ctrees, list(range(4)), np.asarray(log2d))
    prev = np.asarray(batch.log2_total)
    for _ in range(6):
        batch, _m = sfs.run_fullsweep(batch, jnp.zeros(8, jnp.float32),
                                      log2d_w32, cfg)
        cur = np.asarray(batch.log2_total)
        # Greedy synchronous moves never increase the total (each delta
        # <= 0 and kept moves touch disjoint contractions)
        assert np.all(cur <= prev + 1e-3)
        prev = cur


def test_fullsweep_fw_validity_and_audits(rng, random_seed):
    from tnco_tpu.kernels import sa_finite_batched as sfb
    from tnco_tpu.kernels.sa_finite import SweepConfigFW

    max_width = 2.5
    ctrees, ts_inds, output_inds, dims = _setup(rng, random_seed,
                                                n_replicas=4)
    template = ctrees[0]
    n_lanes = template.inds_array.shape[1]
    cfg = SweepConfigFW(n_leaves=template.n_leaves, n_lanes=n_lanes)
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    skip = jnp.zeros(n_lanes, dtype=jnp.uint32)
    batch = sfb.init_batch_fw(ctrees, list(range(4)), max_width,
                              np.asarray(log2d),
                              skip_lanes=np.asarray(skip))
    betas = jnp.linspace(0.0, 10.0, 60, dtype=jnp.float32)
    upd = jnp.asarray(np.arange(60) % 10 == 0)

    out, metrics = sfs.run_fullsweep_fw(batch, betas, upd, max_width,
                                        log2d_w32, skip, cfg)
    assert 0 < int(metrics['applied']) <= int(metrics['moves'])
    log2d_np = np.zeros(n_lanes * 32)
    log2d_np[:len(template.log2_dims_array)] = template.log2_dims_array
    for i in range(4):
        mnodes = np.stack([
            np.asarray(out.min_c0[:, i]),
            np.asarray(out.min_c1[:, i]),
            np.asarray(out.min_par[:, i])
        ], axis=1)
        tree = template.replace_arrays(mnodes,
                                       np.asarray(out.min_inds[..., i]))
        is_valid_contraction_tree(tree, ts_inds, output_inds, dims)
        sl = np.asarray(out.min_slices[:, i])
        for row in tree.inds_array:
            bits = row & ~sl
            w = sum(log2d_np[32 * k + bb] for k in range(len(bits))
                    for bb in range(32) if (int(bits[k]) >> bb) & 1)
            assert w <= max_width + 1e-3
        labels = [
            template.inds_order[pp] for pp in Bitset.from_lanes(
                sl, template.n_inds).positions()
        ]
        total = 0
        tins = tree.inds
        dmap = tree.dims
        for node in tree.nodes:
            if node.is_leaf():
                continue
            union = (frozenset(tins[node.children[0]]) |
                     frozenset(tins[node.children[1]]) |
                     frozenset(labels))
            total += fts.reduce(op.mul, (dmap[x] for x in union), 1)
        got = float(out.min_log2_total[i])
        assert got == pytest.approx(math.log2(total), abs=1e-3)


def test_fullsweep_sparse_cost_model(rng, random_seed):
    """Sparse-index cost model: device min cost matches the label-space
    cost model's exact recompute (mirrors the multiwalk test)."""
    from tnco_tpu.optimize.infinite_memory import SimpleCostModel
    from tnco_tpu.parallel.replicas import ReplicaRunner

    ctrees, ts_inds, output_inds, dims = _setup(rng, random_seed,
                                                n_replicas=4)
    all_inds = sorted(map(str, ctrees[0].all_inds()))
    sparse = frozenset(all_inds[:2])
    cm = SimpleCostModel(sparse_inds=sparse, n_projs=2)
    run = ReplicaRunner(ctrees, list(range(4)), cmodel=cm,
                        engine='sweep')
    run.run(np.linspace(0, 8, 40), chunk_size=20)
    best_i, best = run.best()
    tree = run.min_ctree(best_i)
    is_valid_contraction_tree(tree, ts_inds, output_inds, dims)
    total = 0
    tins = tree.inds
    for p, node in enumerate(tree.nodes):
        if node.is_leaf():
            continue
        total += cm.contraction_cost(tins[node.children[0]],
                                     tins[node.children[1]], tins[p],
                                     tree.dims)
    assert best == pytest.approx(math.log2(total), abs=1e-3)


def test_fullsweep_runner(rng, random_seed):
    from tnco_tpu.parallel.replicas import ReplicaRunner

    ctrees, ts_inds, output_inds, dims = _setup(rng, random_seed,
                                                n_replicas=5)
    run = ReplicaRunner(ctrees, list(range(5)), engine='sweep')
    ni = len(ctrees[0]) - ctrees[0].n_leaves
    out = run.run(np.linspace(0, 10, 48), chunk_size=16)
    assert out['moves'] == 48 * ni * 5
    best_i, best = run.best()
    tree = run.min_ctree(best_i)
    is_valid_contraction_tree(tree, ts_inds, output_inds, dims)
    assert best == pytest.approx(math.log2(tree.total_cost_exact()),
                                 abs=1e-3)


def test_fullsweep_fw_runner(rng, random_seed):
    """FW sweep engine through the public runner: widths respected after
    slicing, exact slice-aware min costs."""
    from tnco_tpu.optimize.finite_width import SimpleCostModel
    from tnco_tpu.parallel.replicas import ReplicaRunnerFW

    max_width = 2.5
    ctrees, ts_inds, output_inds, dims = _setup(rng, random_seed,
                                                n_replicas=4)
    run = ReplicaRunnerFW(ctrees, list(range(4)),
                          cmodel=SimpleCostModel(max_width=max_width),
                          engine='sweep')
    run.run(np.linspace(0, 10, 64), chunk_size=32, update_slices=8)
    template = ctrees[0]
    log2d_np = np.zeros(template.inds_array.shape[1] * 32)
    log2d_np[:len(template.log2_dims_array)] = template.log2_dims_array
    for i in range(4):
        tree = run.min_ctree(i)
        is_valid_contraction_tree(tree, ts_inds, output_inds, dims)
        sl = run.min_slices_lanes(i)
        for row in tree.inds_array:
            bits = row & ~sl
            w = sum(log2d_np[32 * k + bb] for k in range(len(bits))
                    for bb in range(32) if (int(bits[k]) >> bb) & 1)
            assert w <= max_width + 1e-3


def test_fullsweep_interpret_gather_matches_xla(rng, random_seed):
    """Pallas-interpret gathers give the bit-identical trajectory to
    the XLA fallback lowering (the two backends of pallas_gather)."""
    ctrees, *_ = _setup(rng, random_seed, n_replicas=3)
    template = ctrees[0]
    n_lanes = template.inds_array.shape[1]
    cfg = SweepConfig(n_leaves=template.n_leaves, n_lanes=n_lanes)
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    batch = sb.init_batch(ctrees, list(range(3)), np.asarray(log2d))
    betas = jnp.linspace(0.0, 8.0, 12, dtype=jnp.float32)

    ref, mref = sfs.run_fullsweep(batch, betas, log2d_w32, cfg)
    got, mgot = sfs.run_fullsweep(batch, betas, log2d_w32, cfg,
                                  interpret=True)
    assert int(mref['applied']) == int(mgot['applied'])
    assert_batches_identical(ref, got)


def test_fullsweep_popcount_width_matches_pinned(rng, random_seed):
    """On an all-dim-2 network the popcount width fast path is bitwise
    identical to the pinned bit-plane width (integer f32 sums)."""
    ts_inds, output_inds, dims = generate_random_tensors(
        rng, n_output_inds=2, min_dim=2, max_dim=2)
    order = tuple(dict.fromkeys(x for xs in ts_inds for x in xs))
    ctrees = []
    for r in range(4):
        paths = get_random_contraction_path(ts_inds, output_inds,
                                            merge_paths=False,
                                            seed=random_seed + r)
        (path,) = [p for p in paths if p]
        ctrees.append(
            ContractionTree(path, ts_inds, dims, output_inds=output_inds,
                            check_shared_inds=True, inds_order=order))
    template = ctrees[0]
    n_lanes = template.inds_array.shape[1]
    cfg = SweepConfig(n_leaves=template.n_leaves, n_lanes=n_lanes)
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    batch = sb.init_batch(ctrees, list(range(4)), np.asarray(log2d))
    betas = jnp.linspace(0.0, 8.0, 12, dtype=jnp.float32)

    ul = sfs.uniform_log2_dim(template.log2_dims_array)
    assert ul == 1.0
    ref, mref = sfs.run_fullsweep(batch, betas, log2d_w32, cfg)
    got, mgot = sfs.run_fullsweep(batch, betas, log2d_w32, cfg,
                                  uniform_log2=ul)
    assert int(mref['applied']) == int(mgot['applied'])
    assert_batches_identical(ref, got)


def test_delta_log2_local_precision():
    """delta_log2_local == new_total_log2 - lt mathematically, and keeps
    the delta's sign/magnitude at totals where the subtraction form
    underflows to 0 (the Sycamore-scale accept horizon)."""
    from tnco_tpu.ops import costs as costs_ops

    # Moderate regime: both forms agree to f32 roundoff.
    lt = jnp.float32(20.0)
    l_a, l_b = jnp.float32(18.0), jnp.float32(15.0)
    ln_a, ln_b = jnp.float32(17.0), jnp.float32(16.0)
    direct = costs_ops.new_total_log2(lt, l_a, l_b, ln_a, ln_b) - lt
    local = costs_ops.delta_log2_local(lt, l_a, l_b, ln_a, ln_b)
    assert float(local) == pytest.approx(float(direct), abs=1e-5)
    # Exact reference in f64.
    exact = math.log2(2**20.0 - 2**18 - 2**15 + 2**17 + 2**16) - 20.0
    assert float(local) == pytest.approx(exact, rel=1e-5)

    # Deep regime: the move's terms sit ~40 bits below the total, so the
    # subtraction form rounds to 0 while the local form keeps the sign
    # and leading digits.
    lt = jnp.float32(84.0)
    l_a, l_b = jnp.float32(44.0), jnp.float32(40.0)
    ln_a, ln_b = jnp.float32(45.0), jnp.float32(41.0)
    direct = costs_ops.new_total_log2(lt, l_a, l_b, ln_a, ln_b) - lt
    local = costs_ops.delta_log2_local(lt, l_a, l_b, ln_a, ln_b)
    assert float(direct) == 0.0
    exact = (math.log2(2**84.0 - 2**44 - 2**40 + 2**45 + 2**41) - 84.0)
    assert float(local) == pytest.approx(exact, rel=1e-4)
    assert float(local) > 0.0

    # Downhill deep move: sign preserved too.
    local_dn = costs_ops.delta_log2_local(lt, ln_a, ln_b, l_a, l_b)
    assert float(local_dn) < 0.0


def test_fullsweep_mh_local_validity(rng, random_seed):
    """prob_kind='mh_local' (the sweep-engine default): valid trees and
    exact min-cost audits."""
    ctrees, ts_inds, output_inds, dims = _setup(rng, random_seed,
                                                n_replicas=4)
    template = ctrees[0]
    n_lanes = template.inds_array.shape[1]
    cfg = SweepConfig(n_leaves=template.n_leaves, n_lanes=n_lanes,
                      prob_kind='mh_local')
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    batch = sb.init_batch(ctrees, list(range(4)), np.asarray(log2d))
    betas = jnp.linspace(0.0, 10.0, 40, dtype=jnp.float32)

    out, metrics = sfs.run_fullsweep(batch, betas, log2d_w32, cfg)
    assert 0 < int(metrics['applied']) <= int(metrics['moves'])
    for i in range(4):
        mnodes = np.stack([
            np.asarray(out.min_c0[:, i]),
            np.asarray(out.min_c1[:, i]),
            np.asarray(out.min_par[:, i])
        ], axis=1)
        mtree = template.replace_arrays(mnodes,
                                        np.asarray(out.min_inds[..., i]))
        is_valid_contraction_tree(mtree, ts_inds, output_inds, dims)
        exact = math.log2(mtree.total_cost_exact())
        assert float(out.min_log2_total[i]) == pytest.approx(exact,
                                                             abs=1e-3)


def test_runner_sweep_prob_kind_default(rng, random_seed):
    """ReplicaRunner resolves prob_kind=None to the engine default and
    rejects mh_local on non-sweep engines."""
    from tnco_tpu.parallel.replicas import ReplicaRunner

    ctrees, *_ = _setup(rng, random_seed, n_replicas=2)
    r = ReplicaRunner(ctrees, [0, 1], engine='sweep')
    assert r.cfg.prob_kind == 'mh_local'
    r = ReplicaRunner(ctrees, [0, 1], engine='batched')
    assert r.cfg.prob_kind == 'mh'
    with pytest.raises(ValueError, match='mh_local'):
        ReplicaRunner(ctrees, [0, 1], engine='batched',
                      prob_kind='mh_local')
