"""Infinite-memory SA kernel tests: differential oracles vs exact recompute.

Mirrors the reference optimizer tests (tests/test_utils.py:578-769): after
every batch of sweeps the device caches are audited against an independent
pure-Python bigint recompute of the rebuilt tree.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tnco_tpu.ctree import ContractionTree
from tnco_tpu.kernels import sa_infinite as sa
from tnco_tpu.ops import bitops
from tnco_tpu.testing.utils import (exact_log2_total,
                                    generate_random_tensors,
                                    is_valid_contraction_tree)
from tnco_tpu.utils.tn import get_random_contraction_path


def _random_ctree(rng, random_seed, *, hyper=False, **kwargs):
    ts_inds, output_inds, dims = generate_random_tensors(
        rng,
        n_hyper_edges=2 if hyper else 0,
        n_output_inds=2,
        n_hyper_output_inds=1 if hyper else 0,
        **kwargs)
    paths = get_random_contraction_path(ts_inds,
                                        output_inds,
                                        merge_paths=False,
                                        seed=random_seed)
    (path,) = [p for p in paths if p]
    ctree = ContractionTree(path,
                            ts_inds,
                            dims,
                            output_inds=output_inds,
                            check_shared_inds=True)
    return ctree, ts_inds, output_inds, dims


def _audit(state, ctree, ts_inds, output_inds, dims, cfg, log2d):
    """Rebuild host trees from device arrays and audit all caches."""
    cur = sa.state_to_ctree(ctree, state.nodes, state.inds)
    is_valid_contraction_tree(cur, ts_inds, output_inds, dims,
                              check_shared_inds=not cfg.disable_shared_inds)
    best = sa.state_to_ctree(ctree, state.min_nodes, state.min_inds)
    is_valid_contraction_tree(best, ts_inds, output_inds, dims,
                              check_shared_inds=not cfg.disable_shared_inds)

    # Cached log2 totals vs exact bigint recompute
    assert float(state.log2_total) == pytest.approx(exact_log2_total(cur),
                                                    rel=1e-4, abs=1e-4)
    assert float(state.min_log2_total) == pytest.approx(
        exact_log2_total(best), rel=1e-4, abs=1e-4)

    # Per-node cost cache vs vectorized recompute
    lcc_ref = sa.compute_lcc(state.nodes, state.inds, log2d)
    np.testing.assert_allclose(
        np.asarray(state.lcc)[ctree.n_leaves:],
        np.asarray(lcc_ref)[ctree.n_leaves:], rtol=1e-5, atol=1e-5)

    # Hyper cache vs recompute
    hyper_ref = sa.compute_hyper(state.nodes, state.inds)
    np.testing.assert_array_equal(np.asarray(state.hyper),
                                  np.asarray(hyper_ref))
    return cur, best


def test_init_state_matches_oracle(rng, random_seed):
    ctree, *_ = _random_ctree(rng, random_seed)
    state = sa.init_state(ctree, seed=random_seed)
    assert float(state.log2_total) == pytest.approx(exact_log2_total(ctree),
                                                    rel=1e-5)
    assert float(state.min_log2_total) == float(state.log2_total)


@pytest.mark.parametrize('hyper', [False, True])
@pytest.mark.parametrize('rep', range(4))
def test_sweeps_keep_tree_valid(rep, hyper, rng, random_seed):
    ctree, ts_inds, output_inds, dims = _random_ctree(rng, random_seed,
                                                      hyper=hyper)
    cfg = sa.SweepConfig(n_leaves=ctree.n_leaves,
                         n_lanes=ctree.inds_array.shape[1])
    log2d = bitops.pad_log2_dims(ctree.log2_dims_array,
                                 ctree.inds_array.shape[1])
    state = sa.init_state(ctree, seed=random_seed, log2_dims_padded=log2d)

    betas = jnp.linspace(0.0, 20.0, 50, dtype=jnp.float32)
    for _ in range(3):
        state, metrics = sa.run_sweeps(state, betas, log2d, cfg)
        _audit(state, ctree, ts_inds, output_inds, dims, cfg, log2d)
        # min history is non-increasing
        hist = np.asarray(metrics['log2_min_total'])
        assert (np.diff(hist) <= 1e-5).all()
        assert float(state.min_log2_total) <= exact_log2_total(ctree) + 1e-4


def test_greedy_monotone(rng, random_seed):
    ctree, ts_inds, output_inds, dims = _random_ctree(
        rng, random_seed, n_tensors=10)
    cfg = sa.SweepConfig(n_leaves=ctree.n_leaves,
                         n_lanes=ctree.inds_array.shape[1],
                         prob_kind='greedy')
    log2d = bitops.pad_log2_dims(ctree.log2_dims_array,
                                 ctree.inds_array.shape[1])
    state = sa.init_state(ctree, seed=random_seed, log2_dims_padded=log2d)
    betas = jnp.zeros(100, dtype=jnp.float32)
    state, metrics = sa.run_sweeps(state, betas, log2d, cfg)
    hist = np.asarray(metrics['log2_total'])
    # Greedy never accepts an uphill move: totals non-increasing
    assert (np.diff(np.concatenate([[exact_log2_total(ctree)], hist]))
            <= 1e-4).all()
    _audit(state, ctree, ts_inds, output_inds, dims, cfg, log2d)


def test_determinism(rng, random_seed):
    ctree, *_ = _random_ctree(rng, random_seed)
    cfg = sa.SweepConfig(n_leaves=ctree.n_leaves,
                         n_lanes=ctree.inds_array.shape[1])
    log2d = bitops.pad_log2_dims(ctree.log2_dims_array,
                                 ctree.inds_array.shape[1])
    betas = jnp.linspace(0.0, 10.0, 30, dtype=jnp.float32)

    outs = []
    for _ in range(2):
        state = sa.init_state(ctree, seed=random_seed,
                              log2_dims_padded=log2d)
        state, _ = sa.run_sweeps(state, betas, log2d, cfg)
        outs.append((np.asarray(state.nodes), np.asarray(state.inds),
                     float(state.min_log2_total)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
    assert outs[0][2] == outs[1][2]


def test_batch_matches_single(rng, random_seed):
    ctree, *_ = _random_ctree(rng, random_seed, n_tensors=8)
    cfg = sa.SweepConfig(n_leaves=ctree.n_leaves,
                         n_lanes=ctree.inds_array.shape[1])
    log2d = bitops.pad_log2_dims(ctree.log2_dims_array,
                                 ctree.inds_array.shape[1])
    betas = jnp.linspace(0.0, 10.0, 20, dtype=jnp.float32)

    seeds = [random_seed + i for i in range(4)]
    singles = []
    for s in seeds:
        st = sa.init_state(ctree, seed=s, log2_dims_padded=log2d)
        st, _ = sa.run_sweeps(st, betas, log2d, cfg)
        singles.append(float(st.min_log2_total))

    states = [sa.init_state(ctree, seed=s, log2_dims_padded=log2d)
              for s in seeds]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    batch, _ = sa.run_sweeps_batch(batch, betas, log2d, cfg)
    np.testing.assert_allclose(np.asarray(batch.min_log2_total),
                               np.asarray(singles), rtol=1e-6)


def test_known_optimum_chain():
    # Chain of matrices: optimal order is left-to-right (any order has the
    # same cost here with uniform dims; check SA reaches the exact optimum
    # cost of 3 * 2^3 = 24 -> log2(24)).
    path = [(0, 1), (0, 1), (0, 1)]
    ts_inds = [['i', 'j'], ['j', 'k'], ['k', 'l'], ['l', 'm']]
    ctree = ContractionTree(path, ts_inds, 2, check_shared_inds=True)
    cfg = sa.SweepConfig(n_leaves=4, n_lanes=1)
    log2d = bitops.pad_log2_dims(ctree.log2_dims_array, 1)
    state = sa.init_state(ctree, seed=7, log2_dims_padded=log2d)
    betas = jnp.linspace(0.0, 50.0, 100, dtype=jnp.float32)
    state, _ = sa.run_sweeps(state, betas, log2d, cfg)
    # f32 logsumexp tolerance
    assert float(state.min_log2_total) == pytest.approx(np.log2(24),
                                                        abs=1e-3)
