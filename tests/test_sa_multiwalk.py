"""Multi-walk engine: structural validity, cache audits, exact min costs,
and conflict-filter correctness (disjoint application == sequential)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tnco_tpu.ctree import ContractionTree
from tnco_tpu.kernels import sa_batched as sb
from tnco_tpu.kernels import sa_multiwalk as smw
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


@pytest.mark.parametrize('n_walks', [1, 4, 8])
def test_multiwalk_validity_and_audits(n_walks, rng, random_seed):
    ctrees, ts_inds, output_inds, dims = _setup(rng, random_seed)
    template = ctrees[0]
    n_lanes = template.inds_array.shape[1]
    cfg = SweepConfig(n_leaves=template.n_leaves, n_lanes=n_lanes)
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    b = len(ctrees)
    batch = sb.init_batch(ctrees, list(range(b)), np.asarray(log2d))
    pos = jnp.full((n_walks, b), -1, dtype=jnp.int32)
    betas = jnp.linspace(0.0, 10.0, 50, dtype=jnp.float32)

    out, metrics = smw.run_multiwalk(batch, betas, log2d_w32, cfg,
                                     n_walks, pos)
    assert int(metrics['moves']) == 50 * n_walks * b
    assert 0 < int(metrics['applied']) <= int(metrics['moves'])

    for i in range(b):
        nodes = np.stack([
            np.asarray(out.c0[:, i]),
            np.asarray(out.c1[:, i]),
            np.asarray(out.par[:, i])
        ], axis=1)
        tree = template.replace_arrays(nodes, np.asarray(out.inds[..., i]))
        is_valid_contraction_tree(tree, ts_inds, output_inds, dims)

        # Cost-cache audit against a from-scratch recompute
        lcc_ref = np.asarray(
            compute_lcc(jnp.asarray(nodes), out.inds[..., i],
                        jnp.asarray(log2d)))
        got = np.asarray(out.lcc[:, i])
        fin = np.isfinite(lcc_ref)
        np.testing.assert_allclose(got[fin], lcc_ref[fin], atol=1e-4)

        # Hyper refresh correctness
        from tnco_tpu.kernels.sa_infinite import compute_hyper
        hyper_ref = compute_hyper(jnp.asarray(nodes), out.inds[..., i])
        np.testing.assert_array_equal(np.asarray(out.hyper[..., i]),
                                      np.asarray(hyper_ref))

        # Min tree valid and its cost exactly what min_log2_total claims
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


@pytest.mark.parametrize('walk_chunk', [1, 2, 4])
def test_multiwalk_chunked_bit_identical(walk_chunk, rng, random_seed):
    """walk_chunk grouping is bit-identical to the unchunked engine:
    kept proposals touch pairwise-disjoint rows, so group-wise additive
    application only adds exact zeros elsewhere."""
    n_walks = 8
    ctrees, *_ = _setup(rng, random_seed, n_replicas=4)
    template = ctrees[0]
    n_lanes = template.inds_array.shape[1]
    cfg = SweepConfig(n_leaves=template.n_leaves, n_lanes=n_lanes)
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    batch = sb.init_batch(ctrees, list(range(4)), np.asarray(log2d))
    pos = jnp.full((n_walks, 4), -1, dtype=jnp.int32)
    betas = jnp.linspace(0.0, 10.0, 40, dtype=jnp.float32)

    ref, mref = smw.run_multiwalk(batch, betas, log2d_w32, cfg, n_walks,
                                  pos)
    got, mgot = smw.run_multiwalk(batch, betas, log2d_w32, cfg, n_walks,
                                  pos, walk_chunk=walk_chunk)
    assert int(mref['applied']) == int(mgot['applied'])
    np.testing.assert_array_equal(np.asarray(mref['pos']),
                                  np.asarray(mgot['pos']))
    assert_batches_identical(ref, got)


def test_multiwalk_fw_chunked_bit_identical(rng, random_seed):
    """Finite-width variant of the chunked bit-identity check."""
    from tnco_tpu.kernels import sa_finite_batched as sfb
    from tnco_tpu.kernels.sa_finite import SweepConfigFW

    n_walks = 4
    max_width = 3.0
    ctrees, *_ = _setup(rng, random_seed, n_replicas=3)
    template = ctrees[0]
    n_lanes = template.inds_array.shape[1]
    cfg = SweepConfigFW(n_leaves=template.n_leaves, n_lanes=n_lanes)
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    skip = jnp.zeros(n_lanes, dtype=jnp.uint32)
    batch = sfb.init_batch_fw(ctrees, list(range(3)), max_width,
                              np.asarray(log2d),
                              skip_lanes=np.asarray(skip))
    pos = jnp.full((n_walks, 3), -1, dtype=jnp.int32)
    betas = jnp.linspace(0.0, 10.0, 30, dtype=jnp.float32)
    upd = jnp.asarray(np.arange(30) % 10 == 0)

    ref, _ = smw.run_multiwalk_fw(batch, betas, upd, max_width, log2d_w32,
                                  skip, cfg, n_walks, pos)
    got, _ = smw.run_multiwalk_fw(batch, betas, upd, max_width, log2d_w32,
                                  skip, cfg, n_walks, pos, walk_chunk=2)
    assert_batches_identical(ref, got)


def test_multiwalk_greedy_monotone(rng, random_seed):
    ctrees, *_ = _setup(rng, random_seed, n_replicas=4)
    template = ctrees[0]
    n_lanes = template.inds_array.shape[1]
    cfg = SweepConfig(n_leaves=template.n_leaves, n_lanes=n_lanes,
                      prob_kind='greedy')
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    batch = sb.init_batch(ctrees, list(range(4)), np.asarray(log2d))
    pos = jnp.full((4, 4), -1, dtype=jnp.int32)
    prev = np.asarray(batch.log2_total)
    for _ in range(6):
        batch, m = smw.run_multiwalk(batch, jnp.zeros(8, jnp.float32),
                                     log2d_w32, cfg, 4, m['pos']
                                     if _ else pos)
        cur = np.asarray(batch.log2_total)
        # Greedy synchronous moves never increase the total (each delta
        # <= 0 and applied moves touch disjoint contractions)
        assert np.all(cur <= prev + 1e-3)
        prev = cur


def test_multiwalk_runner(rng, random_seed):
    from tnco_tpu.parallel.replicas import ReplicaRunner

    ctrees, ts_inds, output_inds, dims = _setup(rng, random_seed,
                                                n_replicas=5)
    run = ReplicaRunner(ctrees, list(range(5)), engine='multiwalk',
                        n_walks=4)
    out = run.run(np.linspace(0, 10, 48), chunk_size=16)
    assert out['moves'] == 48 * 4 * 5
    best_i, best = run.best()
    tree = run.min_ctree(best_i)
    is_valid_contraction_tree(tree, ts_inds, output_inds, dims)
    assert best == pytest.approx(math.log2(tree.total_cost_exact()),
                                 abs=1e-3)


def test_multiwalk_fw_runner(rng, random_seed):
    """FW multiwalk: widths respected after slicing, exact min costs."""
    import functools as fts
    import operator as op

    from tnco_tpu.bitset import Bitset
    from tnco_tpu.optimize.finite_width import SimpleCostModel
    from tnco_tpu.parallel.replicas import ReplicaRunnerFW

    max_width = 2.5
    ctrees, ts_inds, output_inds, dims = _setup(rng, random_seed,
                                                n_replicas=4)
    run = ReplicaRunnerFW(ctrees, list(range(4)),
                          cmodel=SimpleCostModel(max_width=max_width),
                          engine='multiwalk', n_walks=4)
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
        # reported min == exact slice-aware total of the min tree
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
        got = float(run.log2_min_totals()[i])
        assert got == pytest.approx(math.log2(total), abs=1e-3)


def test_multiwalk_sparse_cost_model(rng, random_seed):
    """Sparse-index cost model on the multiwalk engine: device min cost
    matches the label-space cost model's exact recompute."""
    from tnco_tpu.optimize.infinite_memory import SimpleCostModel
    from tnco_tpu.parallel.replicas import ReplicaRunner

    ctrees, ts_inds, output_inds, dims = _setup(rng, random_seed,
                                                n_replicas=4)
    all_inds = sorted(map(str, ctrees[0].all_inds()))
    sparse = frozenset(all_inds[:2])
    cm = SimpleCostModel(sparse_inds=sparse, n_projs=2)
    run = ReplicaRunner(ctrees, list(range(4)), cmodel=cm,
                        engine='multiwalk', n_walks=4)
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


def _setup_uniform(rng, random_seed, n_replicas=4, dim=2):
    """All-dims-equal network (the popcount width fast-path regime)."""
    ts_inds, output_inds, dims = generate_random_tensors(
        rng, n_output_inds=2, min_dim=dim, max_dim=dim)
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
    return ctrees


@pytest.mark.parametrize('dim', [2, 4])
def test_multiwalk_popcount_width_matches_pinned(dim, rng, random_seed):
    """On an all-dim-`dim` network (integer log2) the popcount width fast
    path — the fix for the round-2 bench regression, docs/ROADMAP.md —
    is bitwise identical to the pinned bit-plane width tree."""
    from tnco_tpu.kernels.sa_fullsweep import uniform_log2_dim

    n_walks = 8
    ctrees = _setup_uniform(rng, random_seed, dim=dim)
    template = ctrees[0]
    n_lanes = template.inds_array.shape[1]
    cfg = SweepConfig(n_leaves=template.n_leaves, n_lanes=n_lanes)
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    b = len(ctrees)
    batch = sb.init_batch(ctrees, list(range(b)), np.asarray(log2d))
    pos = jnp.full((n_walks, b), -1, dtype=jnp.int32)
    betas = jnp.linspace(0.0, 10.0, 40, dtype=jnp.float32)

    ul = uniform_log2_dim(template.log2_dims_array)
    assert ul == float(np.log2(dim))
    ref, mref = smw.run_multiwalk(batch, betas, log2d_w32, cfg, n_walks,
                                  pos)
    got, mgot = smw.run_multiwalk(batch, betas, log2d_w32, cfg, n_walks,
                                  pos, uniform_log2=ul)
    assert int(mref['applied']) == int(mgot['applied'])
    np.testing.assert_array_equal(np.asarray(mref['pos']),
                                  np.asarray(mgot['pos']))
    assert_batches_identical(ref, got)


def test_multiwalk_fw_popcount_width_matches_pinned(rng, random_seed):
    """Finite-width variant: fast-path width/reslice/lcc bitwise-match
    the pinned tree (slices, trees, caches and totals all identical)."""
    from tnco_tpu.kernels import sa_finite_batched as sfb
    from tnco_tpu.kernels.sa_finite import SweepConfigFW
    from tnco_tpu.kernels.sa_fullsweep import uniform_log2_dim

    n_walks = 4
    max_width = 3.0
    ctrees = _setup_uniform(rng, random_seed, n_replicas=3)
    template = ctrees[0]
    n_lanes = template.inds_array.shape[1]
    cfg = SweepConfigFW(n_leaves=template.n_leaves, n_lanes=n_lanes)
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    skip = jnp.zeros(n_lanes, dtype=jnp.uint32)
    batch = sfb.init_batch_fw(ctrees, list(range(3)), max_width,
                              np.asarray(log2d),
                              skip_lanes=np.asarray(skip))
    pos = jnp.full((n_walks, 3), -1, dtype=jnp.int32)
    betas = jnp.linspace(0.0, 10.0, 30, dtype=jnp.float32)
    upd = jnp.asarray(np.arange(30) % 5 == 0)

    ul = uniform_log2_dim(template.log2_dims_array)
    ref, _ = smw.run_multiwalk_fw(batch, betas, upd, max_width, log2d_w32,
                                  skip, cfg, n_walks, pos)
    got, _ = smw.run_multiwalk_fw(batch, betas, upd, max_width, log2d_w32,
                                  skip, cfg, n_walks, pos, uniform_log2=ul)
    assert_batches_identical(ref, got)
