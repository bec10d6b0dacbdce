"""Parallel tempering: swap math, per-lane beta kernels, end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tnco_tpu.kernels import sa_batched as sb
from tnco_tpu.kernels import sa_walks as sw
from tnco_tpu.kernels.sa_infinite import SweepConfig
from tnco_tpu.ops import bitops
from tnco_tpu.parallel.tempering import TemperingLadder
from tnco_tpu.testing.utils import (assert_batches_identical,
                                    generate_random_tensors)
from tnco_tpu.ctree import ContractionTree
from tnco_tpu.utils.tn import get_random_contraction_path


def _setup(rng, random_seed, n_replicas=6):
    ts_inds, output_inds, dims = generate_random_tensors(rng,
                                                         n_output_inds=1)
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


def test_ladder_swap_math(random_seed):
    """Swaps keep the ladder a permutation; deterministic cases accept/
    reject as the Metropolis rule dictates."""
    lad = TemperingLadder(4, beta_min=1.0, beta_max=4.0, seed=random_seed)
    np.testing.assert_allclose(sorted(lad.lane_betas()), lad.ladder)

    # A colder chain holding a CHEAPER state than the hotter chain
    # below it: dbeta*(lt_i - lt_j) = (-1)*(+10) < log2(u) is
    # impossible -> always rejected ... and the reverse always accepted.
    lad2 = TemperingLadder(2, beta_min=1.0, beta_max=2.0,
                           seed=random_seed)
    # lane 0 at beta 1 (hot), lane 1 at beta 2 (cold)
    assert lad2.swap(np.array([0.0, 10.0])) == 1   # hot is cheaper: swap
    lad2b = TemperingLadder(2, beta_min=1.0, beta_max=2.0,
                            seed=random_seed)
    assert lad2b.swap(np.array([10.0, 0.0])) == 0  # cold is cheaper: keep

    # Permutation invariant under many random swaps
    lad3 = TemperingLadder(9, beta_max=30.0, seed=random_seed)
    rng = np.random.default_rng(random_seed)
    for _ in range(20):
        lad3.swap(rng.uniform(5, 15, size=9))
        np.testing.assert_allclose(sorted(lad3.lane_betas()), lad3.ladder)
    assert 0 < lad3.swaps_proposed
    assert 0.0 <= lad3.swap_rate <= 1.0


def test_per_lane_betas_scalar_equivalence(rng, random_seed):
    """[n, B] betas with identical rows == scalar [n] betas, bitwise
    (batched and walks engines)."""
    ctrees, *_ = _setup(rng, random_seed, n_replicas=4)
    template = ctrees[0]
    n_lanes = template.inds_array.shape[1]
    cfg = SweepConfig(n_leaves=template.n_leaves, n_lanes=n_lanes)
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    batch = sb.init_batch(ctrees, list(range(4)), np.asarray(log2d))
    betas1 = jnp.linspace(0.0, 10.0, 20, dtype=jnp.float32)
    betas2 = jnp.tile(betas1[:, None], (1, 4))

    ref, _ = sb.run_sweeps_batched(batch, betas1, log2d_w32, cfg)
    got, _ = sb.run_sweeps_batched(batch, betas2, log2d_w32, cfg)
    assert_batches_identical(ref, got)

    pos = jnp.full((3, 4), -1, dtype=jnp.int32)
    refw, mr = sw.run_walks(batch, betas1, log2d_w32, cfg, pos)
    gotw, mg = sw.run_walks(batch, betas2, log2d_w32, cfg, pos)
    assert int(mr['applied']) == int(mg['applied'])
    assert_batches_identical(refw, gotw)


def test_tempering_runner_end_to_end(rng, random_seed):
    """Ladder-driven chunks through the runner + swaps between chunks."""
    from tnco_tpu.optimize.infinite_memory import SimpleCostModel
    from tnco_tpu.parallel.replicas import ReplicaRunner

    b = 8
    ctrees, *_ = _setup(rng, random_seed, n_replicas=b)
    runner = ReplicaRunner(ctrees, list(range(b)),
                           cmodel=SimpleCostModel(), engine='batched')
    lad = TemperingLadder(b, beta_max=30.0, seed=random_seed)
    for _ in range(4):
        runner.run(lad.betas_for(8), chunk_size=8)
        lad.swap(np.asarray(runner.states.log2_total))
    assert lad.swaps_proposed > 0
    idx, best = runner.best()
    assert np.isfinite(best)
    assert runner.min_ctree(idx).is_valid(check_shared_inds=True)
