"""Batched (lane-major) SA engine must reproduce the vmapped reference
kernel bit-for-bit: same PRNG streams, same trees, same costs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tnco_tpu.ctree import ContractionTree
from tnco_tpu.kernels import sa_batched as sb
from tnco_tpu.kernels import sa_infinite as sa
from tnco_tpu.ops import bitops
from tnco_tpu.testing.utils import generate_random_tensors
from tnco_tpu.utils.tn import get_random_contraction_path


def _states(rng, random_seed, n_replicas=5, hyper=False):
    ts_inds, output_inds, dims = generate_random_tensors(
        rng, n_output_inds=2, n_hyper_edges=2 if hyper else 0,
        n_hyper_output_inds=1 if hyper else 0)
    order = tuple(dict.fromkeys(x for xs in ts_inds for x in xs))
    states, template = [], None
    for r in range(n_replicas):
        paths = get_random_contraction_path(ts_inds, output_inds,
                                            merge_paths=False,
                                            seed=random_seed + r)
        (path,) = [p for p in paths if p]
        ctree = ContractionTree(path, ts_inds, dims,
                                output_inds=output_inds,
                                check_shared_inds=True, inds_order=order)
        template = template or ctree
        states.append(sa.init_state(
            ctree, seed=random_seed + r,
            log2_dims_padded=bitops.pad_log2_dims(
                ctree.log2_dims_array, ctree.inds_array.shape[1])))
    cfg = sa.SweepConfig(n_leaves=template.n_leaves,
                         n_lanes=template.inds_array.shape[1])
    log2d = bitops.pad_log2_dims(template.log2_dims_array,
                                 template.inds_array.shape[1])
    return states, cfg, log2d, template


@pytest.mark.parametrize('hyper', [False, True])
@pytest.mark.parametrize('prob_kind', ['mh', 'greedy'])
def test_batched_matches_vmapped(prob_kind, hyper, rng, random_seed):
    states, cfg, log2d, _ = _states(rng, random_seed, hyper=hyper)
    cfg = sa.SweepConfig(n_leaves=cfg.n_leaves, n_lanes=cfg.n_lanes,
                         prob_kind=prob_kind)
    betas = jnp.linspace(0.0, 15.0, 40, dtype=jnp.float32)

    # Reference: vmapped per-replica kernel
    vstack = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    vout, vmet = sa.run_sweeps_batch(vstack, betas, log2d, cfg)

    # Lane-major engine
    log2d_w32 = jnp.asarray(log2d).reshape(cfg.n_lanes, 32)
    batch = sb.from_states(states)
    bout, bmet = sb.run_sweeps_batched(batch, betas, log2d_w32, cfg)

    np.testing.assert_array_equal(np.asarray(vout.nodes[:, :, 0]),
                                  np.asarray(bout.c0).T)
    np.testing.assert_array_equal(np.asarray(vout.nodes[:, :, 2]),
                                  np.asarray(bout.par).T)
    np.testing.assert_array_equal(
        np.asarray(vout.inds),
        np.moveaxis(np.asarray(bout.inds), -1, 0))
    np.testing.assert_array_equal(
        np.asarray(vout.min_inds),
        np.moveaxis(np.asarray(bout.min_inds), -1, 0))
    np.testing.assert_allclose(np.asarray(vout.min_log2_total),
                               np.asarray(bout.min_log2_total), rtol=1e-6)
    # Same number of total move evaluations
    assert int(np.sum(vmet['moves'])) == int(np.sum(bmet['moves']))

    # Round-trip extraction matches per-replica states
    s0 = sb.replica_state(bout, 0)
    np.testing.assert_array_equal(np.asarray(s0.nodes),
                                  np.asarray(vout.nodes[0]))
    np.testing.assert_array_equal(np.asarray(s0.hyper),
                                  np.asarray(vout.hyper[0]))


def test_streamed_engine_valid(rng, random_seed):
    """Continuous-stream engine: valid trees, consistent costs, quality
    comparable to the lockstep engines."""
    from tnco_tpu.testing.utils import (exact_log2_total,
                                        is_valid_contraction_tree)

    states, cfg, log2d, template = _states(rng, random_seed, n_replicas=6)
    log2d_w32 = jnp.asarray(log2d).reshape(cfg.n_lanes, 32)
    batch = sb.from_states(states)
    n_sweeps = 40
    betas = jnp.linspace(0.0, 15.0, n_sweeps, dtype=jnp.float32)

    pos_b = jnp.full(6, -1, jnp.int32)
    cnt = jnp.zeros(6, jnp.int32)
    out = batch
    for _ in range(20):
        out, met = sb.run_stream_batched(out, betas, 64, log2d_w32, cfg,
                                         pos_b, cnt)
        pos_b, cnt = met['pos_b'], met['sweep_cnt']
        if int(jnp.min(cnt)) >= n_sweeps:
            break
    assert int(jnp.min(cnt)) >= n_sweeps

    for i in range(6):
        s = sb.replica_state(out, i)
        cur = template.replace_arrays(np.asarray(s.nodes),
                                      np.asarray(s.inds))
        is_valid_contraction_tree(cur)
        best = template.replace_arrays(
            np.asarray(jnp.stack([out.min_c0[:, i], out.min_c1[:, i],
                                  out.min_par[:, i]], axis=1)),
            np.asarray(out.min_inds[..., i]))
        is_valid_contraction_tree(best)
        assert float(out.min_log2_total[i]) == pytest.approx(
            exact_log2_total(best), abs=1e-3)


def test_batched_popcount_width_matches_pinned(rng, random_seed):
    """All-dim-2 network: run_sweeps_batched with the popcount width fast
    path (uniform_log2) is bitwise identical to the pinned bit-plane
    width tree (integer f32 sums are exact)."""
    from tnco_tpu.kernels.sa_fullsweep import uniform_log2_dim

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
    cfg = sa.SweepConfig(n_leaves=template.n_leaves, n_lanes=n_lanes)
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    batch = sb.init_batch(ctrees, list(range(4)), np.asarray(log2d))
    betas = jnp.linspace(0.0, 12.0, 30, dtype=jnp.float32)

    ul = uniform_log2_dim(template.log2_dims_array)
    assert ul == 1.0
    ref, mref = sb.run_sweeps_batched(batch, betas, log2d_w32, cfg)
    got, mgot = sb.run_sweeps_batched(batch, betas, log2d_w32, cfg,
                                      uniform_log2=ul)
    from tnco_tpu.testing.utils import assert_batches_identical
    assert_batches_identical(ref, got)
    np.testing.assert_array_equal(
        np.asarray(mref['log2_min_total']),
        np.asarray(mgot['log2_min_total']))
