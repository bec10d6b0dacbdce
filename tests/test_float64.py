"""cost_type='float64' runs the device kernels in f64 under JAX x64 mode.

Reference parity: cost_type selects the C++ template instantiation
(include/tnco/globals.hpp:81-117).  Here it selects the device log2-cost
dtype — float64 requires x64 mode; without it the engines stay in f32
with exact host bigint audits (see tnco_tpu.ops.bitops.device_dtype).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tnco_tpu.ctree import ContractionTree
from tnco_tpu.ops import bitops
from tnco_tpu.testing.utils import generate_random_tensors
from tnco_tpu.utils.tn import get_random_contraction_path


def _ctree(rng, random_seed):
    ts_inds, output_inds, dims = generate_random_tensors(rng,
                                                         n_output_inds=2)
    paths = get_random_contraction_path(ts_inds, output_inds,
                                        merge_paths=False, seed=random_seed)
    (path,) = [p for p in paths if p]
    return ContractionTree(path, ts_inds, dims, output_inds=output_inds,
                           check_shared_inds=True)


def test_device_dtype_resolution():
    assert bitops.device_dtype('float32') == jnp.float32
    # Without x64 every wide tag falls back to f32
    assert bitops.device_dtype('float64') == jnp.float32
    with jax.enable_x64(True):
        assert bitops.device_dtype('float64') == jnp.float64
        assert bitops.device_dtype('float128') == jnp.float64
        assert bitops.device_dtype('float1024') == jnp.float64
        assert bitops.device_dtype('float32') == jnp.float32


def test_im_optimizer_float64(rng, random_seed):
    from tnco_tpu.optimize.infinite_memory import (Optimizer,
                                                   SimpleCostModel)
    from tnco_tpu.optimize.prob import MetropolisHastings

    with jax.enable_x64(True):
        opt = Optimizer(_ctree(rng, random_seed),
                        SimpleCostModel(cost_type='float64'),
                        seed=random_seed)
        assert opt._state.lcc.dtype == jnp.float64
        prob = MetropolisHastings(beta=1.0)
        for _ in range(10):
            opt.update(prob)
        ok, msg = opt.is_valid(return_message=True)
        assert ok, msg
        # f64 log2 total matches the exact bigint recompute very tightly
        import math
        assert opt.log2_min_total_cost == pytest.approx(
            math.log2(int(opt.min_total_cost)), abs=1e-9)


def test_fw_optimizer_float64(rng, random_seed):
    from tnco_tpu.optimize.finite_width import Optimizer, SimpleCostModel
    from tnco_tpu.optimize.prob import MetropolisHastings

    with jax.enable_x64(True):
        opt = Optimizer(_ctree(rng, random_seed),
                        SimpleCostModel(max_width=3.0,
                                        cost_type='float64'),
                        seed=random_seed)
        assert opt._state.lcc.dtype == jnp.float64
        prob = MetropolisHastings(beta=1.0)
        for i in range(10):
            opt.update(prob, update_slices=(i % 3 == 0))
        ok, msg = opt.is_valid(return_message=True)
        assert ok, msg


def test_replica_runner_float64(rng, random_seed):
    from tnco_tpu.parallel.replicas import ReplicaRunner

    with jax.enable_x64(True):
        ctrees = [_ctree(rng, random_seed) for _ in range(3)]
        # same-shape guard: regenerate until shapes match (or use one)
        ctrees = [ctrees[0]] * 3
        run = ReplicaRunner(ctrees, [1, 2, 3], engine='batched',
                            dtype=jnp.float64)
        out = run.run(np.linspace(0.0, 5.0, 8), chunk_size=4)
        assert np.asarray(run.states.min_log2_total).dtype == np.float64
        assert out['moves'] > 0
        assert np.all(np.isfinite(run.log2_min_totals()))


def test_walks_engine_float64(rng, random_seed):
    """The chained pull-engine's 2-plane (f64) codec paths: bit-identity
    to multiwalk under the sequential claim holds in x64 too."""
    from tnco_tpu.kernels import sa_batched as sb
    from tnco_tpu.kernels import sa_multiwalk as smw
    from tnco_tpu.kernels import sa_walks as sw
    from tnco_tpu.kernels.sa_infinite import SweepConfig
    from tnco_tpu.testing.utils import assert_batches_identical

    with jax.enable_x64(True):
        ctree = _ctree(rng, random_seed)
        ctrees = [ctree] * 3
        n_lanes = ctree.inds_array.shape[1]
        cfg = SweepConfig(n_leaves=ctree.n_leaves, n_lanes=n_lanes)
        log2d = bitops.pad_log2_dims(ctree.log2_dims_array, n_lanes,
                                     jnp.float64)
        log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
        batch = sb.init_batch(ctrees, [1, 2, 3], np.asarray(log2d),
                              dtype=np.float64)
        pos = jnp.full((4, 3), -1, dtype=jnp.int32)
        betas = jnp.linspace(0.0, 8.0, 20, dtype=jnp.float64)

        ref, mref = smw.run_multiwalk(batch, betas, log2d_w32, cfg, 4,
                                      pos)
        got, mgot = sw.run_walks(batch, betas, log2d_w32, cfg, pos,
                                 claim='sequential')
        assert np.asarray(got.lcc).dtype == np.float64
        assert int(mref['applied']) == int(mgot['applied'])
        assert_batches_identical(ref, got)
