"""Pallas streaming kernel: interpret-mode correctness (CI-safe).

On real TPUs the kernel is validated by the same checks run directly
(docs/ROADMAP.md); here the TPU interpreter executes a tiny instance.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tnco_tpu.ctree import ContractionTree
from tnco_tpu.kernels import pallas_stream as pst
from tnco_tpu.kernels import sa_batched as sb
from tnco_tpu.kernels import sa_infinite as sa
from tnco_tpu.ops import bitops
from tnco_tpu.testing.utils import (exact_log2_total,
                                    is_valid_contraction_tree)
from tnco_tpu.utils.tn import get_random_contraction_path


def test_pallas_stream_interpret(rng, random_seed):
    ts_inds = [('a', 'b'), ('b', 'c'), ('c', 'd'), ('d', 'e'),
               ('e', 'f'), ('f', 'g')]
    dims = {x: 2 for x in 'abcdefg'}
    output_inds = frozenset({'a', 'g'})
    order = tuple('abcdefg')
    B = 2
    cts = []
    for r in range(B):
        path = get_random_contraction_path(ts_inds, output_inds,
                                           seed=random_seed + r)
        cts.append(
            ContractionTree(path, ts_inds, dims, output_inds=output_inds,
                            check_shared_inds=True, inds_order=order))
    t = cts[0]
    cfg = sa.SweepConfig(n_leaves=t.n_leaves,
                         n_lanes=t.inds_array.shape[1])
    log2d = bitops.pad_log2_dims(t.log2_dims_array,
                                 t.inds_array.shape[1])
    batch = sb.init_batch(cts, [random_seed, random_seed + 1],
                          np.asarray(log2d))
    betas = jnp.linspace(0.0, 10.0, 4, dtype=jnp.float32)

    out, met = pst.run_stream_pallas(batch, betas, 48, cfg, log2d,
                                     block_b=2, interpret=True)
    cnt = np.asarray(met['sweep_cnt'])
    assert cnt.min() >= 4  # all sweeps completed
    assert int(np.asarray(met['moves']).sum()) > 0

    for i in range(B):
        nodes = np.stack([
            np.asarray(out.c0[:, i]),
            np.asarray(out.c1[:, i]),
            np.asarray(out.par[:, i])
        ], axis=1)
        cur = t.replace_arrays(nodes, np.asarray(out.inds[..., i]))
        is_valid_contraction_tree(cur, ts_inds, output_inds, dims)
        nm = np.stack([
            np.asarray(out.min_c0[:, i]),
            np.asarray(out.min_c1[:, i]),
            np.asarray(out.min_par[:, i])
        ], axis=1)
        best = t.replace_arrays(nm, np.asarray(out.min_inds[..., i]))
        is_valid_contraction_tree(best, ts_inds, output_inds, dims)
        assert float(out.min_log2_total[i]) == pytest.approx(
            exact_log2_total(best), abs=2e-3)
        assert float(out.min_log2_total[i]) <= \
            exact_log2_total(cts[i]) + 1e-4
