"""Chained pull-engine (sa_walks): bit-identity to the masked multi-walk
engine under the sequential claim, and structural validity + exact cost
audits under the (default) pairwise claim."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tnco_tpu.ctree import ContractionTree
from tnco_tpu.kernels import sa_batched as sb
from tnco_tpu.kernels import sa_finite_batched as sfb
from tnco_tpu.kernels import sa_multiwalk as smw
from tnco_tpu.kernels import sa_walks as sw
from tnco_tpu.kernels.sa_finite import SweepConfigFW
from tnco_tpu.kernels.sa_infinite import SweepConfig, compute_lcc
from tnco_tpu.ops import bitops
from tnco_tpu.testing.utils import (assert_batches_identical,
                                    generate_random_tensors,
                                    is_valid_contraction_tree)
from tnco_tpu.utils.tn import get_random_contraction_path


def _setup(rng, random_seed, n_replicas=5):
    ts_inds, output_inds, dims = generate_random_tensors(rng,
                                                         n_hyper_edges=1,
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


def _im_batch(ctrees):
    template = ctrees[0]
    n_lanes = template.inds_array.shape[1]
    cfg = SweepConfig(n_leaves=template.n_leaves, n_lanes=n_lanes)
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    batch = sb.init_batch(ctrees, list(range(len(ctrees))),
                          np.asarray(log2d))
    return cfg, log2d, log2d_w32, batch


@pytest.mark.parametrize('n_walks', [1, 4])
def test_walks_bit_identical_to_multiwalk(n_walks, rng, random_seed):
    """claim='sequential' reproduces the masked multi-walk engine's
    trajectories bit for bit (same PRNG stream, same widths/totals,
    same additive float updates, same conflict resolution)."""
    ctrees, *_ = _setup(rng, random_seed)
    b = len(ctrees)
    cfg, _log2d, log2d_w32, batch = _im_batch(ctrees)
    pos = jnp.full((n_walks, b), -1, dtype=jnp.int32)
    betas = jnp.linspace(0.0, 10.0, 40, dtype=jnp.float32)

    ref, mref = smw.run_multiwalk(batch, betas, log2d_w32, cfg, n_walks,
                                  pos)
    got, mgot = sw.run_walks(batch, betas, log2d_w32, cfg, pos,
                             claim='sequential')
    assert int(mref['moves']) == int(mgot['moves'])
    assert int(mref['applied']) == int(mgot['applied'])
    np.testing.assert_array_equal(np.asarray(mref['pos']),
                                  np.asarray(mgot['pos']))
    assert_batches_identical(ref, got)


def test_walks_fw_bit_identical_to_multiwalk(rng, random_seed):
    n_walks = 4
    max_width = 3.0
    ctrees, *_ = _setup(rng, random_seed, n_replicas=4)
    template = ctrees[0]
    n_lanes = template.inds_array.shape[1]
    cfg = SweepConfigFW(n_leaves=template.n_leaves, n_lanes=n_lanes)
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    skip = jnp.zeros(n_lanes, dtype=jnp.uint32)
    batch = sfb.init_batch_fw(ctrees, list(range(4)), max_width,
                              np.asarray(log2d),
                              skip_lanes=np.asarray(skip))
    pos = jnp.full((n_walks, 4), -1, dtype=jnp.int32)
    betas = jnp.linspace(0.0, 10.0, 30, dtype=jnp.float32)
    upd = jnp.asarray(np.arange(30) % 10 == 0)

    ref, mref = smw.run_multiwalk_fw(batch, betas, upd, max_width,
                                     log2d_w32, skip, cfg, n_walks, pos)
    got, mgot = sw.run_walks_fw(batch, betas, upd, max_width, log2d_w32,
                                skip, cfg, pos, claim='sequential')
    assert int(mref['applied']) == int(mgot['applied'])
    assert_batches_identical(ref, got)


@pytest.mark.parametrize('on_block', ['restart', 'dedup'])
def test_walks_on_block_bit_identical(on_block, rng, random_seed):
    """The convoy-breaking walk schedules ('restart'/'dedup') stay
    bit-identical between the walks and multiwalk engines, and the
    trees remain valid with exact min costs."""
    ctrees, ts_inds, output_inds, dims = _setup(rng, random_seed)
    template = ctrees[0]
    b = len(ctrees)
    n_walks = 6
    cfg, _log2d, log2d_w32, batch = _im_batch(ctrees)
    pos = jnp.full((n_walks, b), -1, dtype=jnp.int32)
    betas = jnp.linspace(0.0, 10.0, 40, dtype=jnp.float32)

    ref, mref = smw.run_multiwalk(batch, betas, log2d_w32, cfg, n_walks,
                                  pos, on_block=on_block)
    got, mgot = sw.run_walks(batch, betas, log2d_w32, cfg, pos,
                             claim='sequential', on_block=on_block)
    assert int(mref['applied']) == int(mgot['applied'])
    np.testing.assert_array_equal(np.asarray(mref['pos']),
                                  np.asarray(mgot['pos']))
    assert_batches_identical(ref, got)

    for i in range(b):
        mnodes = np.stack([
            np.asarray(got.min_c0[:, i]),
            np.asarray(got.min_c1[:, i]),
            np.asarray(got.min_par[:, i])
        ], axis=1)
        mtree = template.replace_arrays(mnodes,
                                        np.asarray(got.min_inds[..., i]))
        is_valid_contraction_tree(mtree, ts_inds, output_inds, dims)
        exact = math.log2(mtree.total_cost_exact())
        assert float(got.min_log2_total[i]) == pytest.approx(exact,
                                                             abs=1e-3)


def test_walks_on_block_restart_noop_single_walk(rng, random_seed):
    """P=1 has no conflicts, so 'restart' cannot change the trajectory
    (it only reroutes conflict-discarded walks)."""
    ctrees, *_ = _setup(rng, random_seed, n_replicas=3)
    cfg, _log2d, log2d_w32, batch = _im_batch(ctrees)
    pos = jnp.full((1, 3), -1, dtype=jnp.int32)
    betas = jnp.linspace(0.0, 10.0, 30, dtype=jnp.float32)
    a, ma = sw.run_walks(batch, betas, log2d_w32, cfg, pos,
                         on_block='advance')
    b, mb = sw.run_walks(batch, betas, log2d_w32, cfg, pos,
                         on_block='restart')
    assert int(ma['applied']) == int(mb['applied'])
    np.testing.assert_array_equal(np.asarray(ma['pos']),
                                  np.asarray(mb['pos']))
    assert_batches_identical(a, b)


def test_walks_fw_on_block_bit_identical(rng, random_seed):
    """FW variant: 'dedup' stays bit-identical across engines and keeps
    the width cap."""
    from tnco_tpu.kernels.sa_finite import _WIDTH_EPS

    n_walks = 6
    max_width = 3.0
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
    pos = jnp.full((n_walks, 4), -1, dtype=jnp.int32)
    betas = jnp.linspace(0.0, 10.0, 30, dtype=jnp.float32)
    upd = jnp.asarray(np.arange(30) % 10 == 0)

    ref, mref = smw.run_multiwalk_fw(batch, betas, upd, max_width,
                                     log2d_w32, skip, cfg, n_walks, pos,
                                     on_block='dedup')
    got, mgot = sw.run_walks_fw(batch, betas, upd, max_width, log2d_w32,
                                skip, cfg, pos, claim='sequential',
                                on_block='dedup')
    assert int(mref['applied']) == int(mgot['applied'])
    assert_batches_identical(ref, got)

    log2d_arr = np.asarray(log2d)
    for i in range(4):
        inds = np.asarray(got.inds[..., i])
        slices = np.asarray(got.slices[:, i])
        sliced = inds & ~slices[None, :]
        widths = np.zeros(inds.shape[0])
        for w in range(n_lanes):
            for s in range(32):
                mask = (sliced[:, w] >> s) & 1
                widths += mask * log2d_arr[w * 32 + s]
        assert (widths <= max_width + _WIDTH_EPS + 1e-5).all()


@pytest.mark.parametrize('n_walks', [1, 6])
def test_walks_pairwise_validity_and_audits(n_walks, rng, random_seed):
    """Default pairwise claim: trees stay valid, caches exact, min cost
    matches the exact bigint recompute."""
    ctrees, ts_inds, output_inds, dims = _setup(rng, random_seed)
    template = ctrees[0]
    b = len(ctrees)
    cfg, log2d, log2d_w32, batch = _im_batch(ctrees)
    pos = jnp.full((n_walks, b), -1, dtype=jnp.int32)
    betas = jnp.linspace(0.0, 10.0, 50, dtype=jnp.float32)

    out, metrics = sw.run_walks(batch, betas, log2d_w32, cfg, pos,
                                claim='pairwise')
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

        lcc_ref = np.asarray(
            compute_lcc(jnp.asarray(nodes), out.inds[..., i],
                        jnp.asarray(log2d)))
        got = np.asarray(out.lcc[:, i])
        fin = np.isfinite(lcc_ref)
        np.testing.assert_allclose(got[fin], lcc_ref[fin], atol=1e-4)

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


def test_walks_fw_pairwise_validity(rng, random_seed):
    """FW pairwise claim: widths fit after slicing, min slices tracked."""
    from tnco_tpu.kernels.sa_finite import _WIDTH_EPS

    n_walks = 6
    max_width = 3.0
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
    pos = jnp.full((n_walks, 4), -1, dtype=jnp.int32)
    betas = jnp.linspace(0.0, 10.0, 60, dtype=jnp.float32)
    upd = jnp.asarray(np.arange(60) % 10 == 0)

    out, metrics = sw.run_walks_fw(batch, betas, upd, max_width,
                                   log2d_w32, skip, cfg, pos,
                                   claim='pairwise')
    assert 0 < int(metrics['applied']) <= int(metrics['moves'])
    log2d_arr = np.asarray(log2d)
    for i in range(4):
        nodes = np.stack([
            np.asarray(out.c0[:, i]),
            np.asarray(out.c1[:, i]),
            np.asarray(out.par[:, i])
        ], axis=1)
        tree = template.replace_arrays(nodes, np.asarray(out.inds[..., i]))
        is_valid_contraction_tree(tree, ts_inds, output_inds, dims)
        # Every tensor fits max_width once slices are removed.
        inds = np.asarray(out.inds[..., i])
        slices = np.asarray(out.slices[:, i])
        sliced = inds & ~slices[None, :]
        widths = np.zeros(inds.shape[0])
        for w in range(n_lanes):
            for s in range(32):
                mask = (sliced[:, w] >> s) & 1
                widths += mask * log2d_arr[w * 32 + s]
        assert (widths <= max_width + _WIDTH_EPS + 1e-5).all()


def test_walks_deterministic(rng, random_seed):
    ctrees, *_ = _setup(rng, random_seed, n_replicas=3)
    cfg, _log2d, log2d_w32, batch = _im_batch(ctrees)
    pos = jnp.full((4, 3), -1, dtype=jnp.int32)
    betas = jnp.linspace(0.0, 8.0, 25, dtype=jnp.float32)
    a, ma = sw.run_walks(batch, betas, log2d_w32, cfg, pos)
    b, mb = sw.run_walks(batch, betas, log2d_w32, cfg, pos)
    assert int(ma['applied']) == int(mb['applied'])
    assert_batches_identical(a, b)


def test_walks_runner_end_to_end(rng, random_seed):
    """Runner dispatch: IM + FW walks engines, exchange, valid results."""
    from tnco_tpu.optimize.finite_width import SimpleCostModel as FWModel
    from tnco_tpu.optimize.infinite_memory import SimpleCostModel
    from tnco_tpu.parallel.replicas import ReplicaRunner, ReplicaRunnerFW

    ctrees, *_ = _setup(rng, random_seed, n_replicas=4)
    betas = np.linspace(0, 10, 30).astype(np.float32)

    r1 = ReplicaRunner(ctrees, list(range(4)), cmodel=SimpleCostModel(),
                       engine='walks', n_walks=4)
    out = r1.run(betas, chunk_size=15, exchange_every=1)
    assert out['moves'] == 30 * 4 * 4
    idx, best = r1.best()
    assert np.isfinite(best)
    assert r1.min_ctree(idx).is_valid(check_shared_inds=True)
    assert float(best) == pytest.approx(
        math.log2(r1.min_ctree(idx).total_cost_exact()), abs=1e-3)

    r2 = ReplicaRunnerFW(ctrees, list(range(4)),
                         cmodel=FWModel(max_width=3.0), engine='walks',
                         n_walks=4)
    r2.run(betas, chunk_size=15, update_slices=10)
    lm = r2.log2_min_totals()
    idx = int(np.argmin(lm))
    assert r2.min_ctree(idx).is_valid(check_shared_inds=True)


def test_walks_sharded_bit_identical(rng, random_seed):
    """shard_map execution over the 8-device virtual mesh reproduces
    the single-device trajectories bit for bit (replicas independent)."""
    from tnco_tpu.parallel.replicas import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip('needs >= 4 devices')
    mesh = make_mesh(jax.devices()[:4])
    ctrees, *_ = _setup(rng, random_seed, n_replicas=8)
    cfg, _log2d, log2d_w32, batch = _im_batch(ctrees)
    pos = jnp.full((3, 8), -1, dtype=jnp.int32)
    betas = jnp.linspace(0.0, 8.0, 20, dtype=jnp.float32)

    ref, mref = sw.run_walks(batch, betas, log2d_w32, cfg, pos)
    got, mgot = sw.run_walks_sharded(batch, betas, log2d_w32, cfg, pos,
                                     mesh)
    assert int(mref['moves']) == int(mgot['moves'])
    assert int(mref['applied']) == int(mgot['applied'])
    assert_batches_identical(ref, got)


def test_walks_sharded_runner_fw(rng, random_seed):
    """FW walks on a 2-D ('dcn', 'ici') mesh through the runner, with
    exchange collectives restricted to the ici axis."""
    from tnco_tpu.optimize.finite_width import SimpleCostModel as FWModel
    from tnco_tpu.parallel.replicas import ReplicaRunnerFW, make_mesh

    if len(jax.devices()) < 4:
        pytest.skip('needs >= 4 devices')
    mesh = make_mesh(jax.devices()[:4], shape=(2, 2),
                     axis_names=('dcn', 'ici'))
    ctrees, *_ = _setup(rng, random_seed, n_replicas=8)
    runner = ReplicaRunnerFW(ctrees, list(range(8)),
                             cmodel=FWModel(max_width=3.0),
                             engine='walks', n_walks=4, mesh=mesh)
    runner.run(np.linspace(0, 10, 30).astype(np.float32), chunk_size=15,
               update_slices=10, exchange_every=1,
               exchange_axes=('ici',))
    lm = runner.log2_min_totals()
    idx = int(np.argmin(lm))
    assert np.isfinite(lm[idx])
    assert runner.min_ctree(idx).is_valid(check_shared_inds=True)


def test_walks_fw_fast_reslice_bit_identical(rng, random_seed):
    """With uniform power-of-two dims, run_walks_fw takes the
    plane-layout fast path (sorted-space slicer reading the packed
    state in place + lcc rebuilt from the incrementally-maintained
    union planes).  It must be bit-identical to the reference path
    (``uniform_log2=None``): the popcount widths, the slicer selection
    and the union-plane lcc are all exact-integer computations."""
    from tnco_tpu.kernels.sa_fullsweep import uniform_log2_dim

    n_walks = 4
    max_width = 3.0
    ts_inds, output_inds, dims = generate_random_tensors(
        rng, n_hyper_edges=1, n_output_inds=2)
    dims = {k: 2 for k in dims}  # uniform power-of-two dims
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
    cfg = SweepConfigFW(n_leaves=template.n_leaves, n_lanes=n_lanes)
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    skip = jnp.zeros(n_lanes, dtype=jnp.uint32)
    ul = uniform_log2_dim(template.log2_dims_array)
    assert ul is not None and float(ul) == 1.0
    batch = sfb.init_batch_fw(ctrees, list(range(4)), max_width,
                              np.asarray(log2d),
                              skip_lanes=np.asarray(skip))
    pos = jnp.full((n_walks, 4), -1, dtype=jnp.int32)
    betas = jnp.linspace(0.0, 10.0, 40, dtype=jnp.float32)
    upd = jnp.asarray(np.arange(40) % 4 == 0)
    # The reslice path only runs with a nonzero slice set.
    assert np.asarray(batch.slices).any()

    ref, mref = sw.run_walks_fw(batch, betas, upd, max_width, log2d_w32,
                                skip, cfg, pos, claim='sequential')
    got, mgot = sw.run_walks_fw(batch, betas, upd, max_width, log2d_w32,
                                skip, cfg, pos, claim='sequential',
                                uniform_log2=ul)
    assert int(mref['applied']) == int(mgot['applied'])
    assert_batches_identical(ref, got)


@pytest.mark.parametrize('n_walks', [1, 6])
def test_walks_chained_accept_bit_identical(n_walks, rng, random_seed):
    """accept_rule='chained' (running-total Metropolis inside the claim
    scan) stays bit-identical between the walks and multiwalk engines,
    and the min trees remain valid with exact costs."""
    ctrees, ts_inds, output_inds, dims = _setup(rng, random_seed)
    template = ctrees[0]
    b = len(ctrees)
    cfg, _log2d, log2d_w32, batch = _im_batch(ctrees)
    pos = jnp.full((n_walks, b), -1, dtype=jnp.int32)
    betas = jnp.linspace(0.0, 10.0, 40, dtype=jnp.float32)

    ref, mref = smw.run_multiwalk(batch, betas, log2d_w32, cfg, n_walks,
                                  pos, accept_rule='chained')
    got, mgot = sw.run_walks(batch, betas, log2d_w32, cfg, pos,
                             claim='sequential', accept_rule='chained')
    assert int(mref['applied']) == int(mgot['applied'])
    np.testing.assert_array_equal(np.asarray(mref['pos']),
                                  np.asarray(mgot['pos']))
    assert_batches_identical(ref, got)

    for i in range(b):
        mnodes = np.stack([
            np.asarray(got.min_c0[:, i]),
            np.asarray(got.min_c1[:, i]),
            np.asarray(got.min_par[:, i])
        ], axis=1)
        mtree = template.replace_arrays(mnodes,
                                        np.asarray(got.min_inds[..., i]))
        is_valid_contraction_tree(mtree, ts_inds, output_inds, dims)
        exact = math.log2(mtree.total_cost_exact())
        assert float(got.min_log2_total[i]) == pytest.approx(exact,
                                                             abs=1e-3)


def test_walks_chained_single_walk_matches_round(rng, random_seed):
    """P=1: the running total IS the pre-round total (no earlier walks
    in the chain), so 'chained' and 'round' must apply the same moves
    and land on the same trees."""
    ctrees, *_ = _setup(rng, random_seed, n_replicas=3)
    cfg, _log2d, log2d_w32, batch = _im_batch(ctrees)
    pos = jnp.full((1, 3), -1, dtype=jnp.int32)
    betas = jnp.linspace(0.0, 10.0, 30, dtype=jnp.float32)
    a, ma = sw.run_walks(batch, betas, log2d_w32, cfg, pos,
                         accept_rule='round')
    b, mb = sw.run_walks(batch, betas, log2d_w32, cfg, pos,
                         accept_rule='chained')
    assert int(ma['applied']) == int(mb['applied'])
    np.testing.assert_array_equal(np.asarray(a.c0), np.asarray(b.c0))
    np.testing.assert_array_equal(np.asarray(a.par), np.asarray(b.par))
    np.testing.assert_array_equal(np.asarray(a.inds), np.asarray(b.inds))


def test_walks_fw_chained_accept_bit_identical(rng, random_seed):
    """FW variant: 'chained' stays bit-identical across engines and
    keeps the width cap."""
    from tnco_tpu.kernels.sa_finite import _WIDTH_EPS

    n_walks = 6
    max_width = 3.0
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
    pos = jnp.full((n_walks, 4), -1, dtype=jnp.int32)
    betas = jnp.linspace(0.0, 10.0, 30, dtype=jnp.float32)
    upd = jnp.asarray(np.arange(30) % 10 == 0)

    ref, mref = smw.run_multiwalk_fw(batch, betas, upd, max_width,
                                     log2d_w32, skip, cfg, n_walks, pos,
                                     accept_rule='chained')
    got, mgot = sw.run_walks_fw(batch, betas, upd, max_width, log2d_w32,
                                skip, cfg, pos, claim='sequential',
                                accept_rule='chained')
    assert int(mref['applied']) == int(mgot['applied'])
    assert_batches_identical(ref, got)

    log2d_arr = np.asarray(log2d)
    for i in range(4):
        inds = np.asarray(got.inds[..., i])
        slices = np.asarray(got.slices[:, i])
        sliced = inds & ~slices[None, :]
        widths = np.zeros(inds.shape[0])
        for w in range(n_lanes):
            for s in range(32):
                mask = (sliced[:, w] >> s) & 1
                widths += mask * log2d_arr[w * 32 + s]
        assert (widths <= max_width + _WIDTH_EPS + 1e-5).all()


def test_walks_chained_runner_plumbing(rng, random_seed):
    """accept_rule reaches the engines through the runners, and the
    guard refuses it on engines without the chained scan."""
    from tnco_tpu.optimize.infinite_memory import SimpleCostModel
    from tnco_tpu.parallel.replicas import ReplicaRunner

    ctrees, *_ = _setup(rng, random_seed, n_replicas=4)
    runner = ReplicaRunner(ctrees, list(range(4)), engine='walks',
                           n_walks=4, accept_rule='chained')
    runner.run(np.linspace(0.0, 5.0, 16, dtype=np.float32),
               chunk_size=16)
    assert np.isfinite(runner.log2_min_totals()).all()
    with pytest.raises(ValueError, match='accept_rule'):
        ReplicaRunner(ctrees, list(range(4)), engine='batched',
                      accept_rule='chained')
