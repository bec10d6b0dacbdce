"""Benchmark: SA move evaluations/sec/chip on the 8x8 lattice TN.

Runs the infinite-memory SA kernel on a replica batch (BASELINE.md config
#2: 2D square lattice 8x8, bond dim 2) on the available accelerator and
prints ONE JSON line with moves/sec vs the 1e7 moves/sec/chip baseline.
"""

import json
import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.networks import lattice_2d
    from tnco_tpu.ctree import ContractionTree
    from tnco_tpu.kernels import sa_infinite as sa
    from tnco_tpu.ops import bitops
    from tnco_tpu.utils.tn import get_random_contraction_path

    platform = jax.devices()[0].platform
    n_replicas = 512 if platform != 'cpu' else 32
    n_sweeps = 256 if platform != 'cpu' else 32

    ts_inds, output_inds, dims = lattice_2d(8, 8)
    order = tuple(dict.fromkeys(x for xs in ts_inds for x in xs))

    states = []
    template = None
    for r in range(n_replicas):
        path = get_random_contraction_path(ts_inds, output_inds, seed=r)
        ctree = ContractionTree(path, ts_inds, dims,
                                output_inds=output_inds,
                                check_shared_inds=True, inds_order=order)
        template = template or ctree
        states.append(
            sa.init_state(
                ctree, seed=r,
                log2_dims_padded=bitops.pad_log2_dims(
                    ctree.log2_dims_array, ctree.inds_array.shape[1])))
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    cfg = sa.SweepConfig(n_leaves=template.n_leaves,
                         n_lanes=template.inds_array.shape[1])
    log2d = bitops.pad_log2_dims(template.log2_dims_array,
                                 template.inds_array.shape[1])
    betas = jnp.linspace(0.0, 30.0, n_sweeps, dtype=jnp.float32)

    # Warm-up / compile.  NOTE: on the remote-tunneled TPU platform,
    # block_until_ready does not reliably block — an actual host transfer
    # does, so all timings force one.
    out, metrics = sa.run_sweeps_batch(batch, betas, log2d, cfg)
    np.asarray(metrics['moves'])

    t0 = time.perf_counter()
    out, metrics = sa.run_sweeps_batch(batch, betas, log2d, cfg)
    moves = int(np.sum(np.asarray(metrics['moves'])))
    elapsed = time.perf_counter() - t0
    moves_per_sec = moves / elapsed

    print(json.dumps({
        'metric': 'sa_moves_per_sec_per_chip',
        'value': moves_per_sec,
        'unit': 'moves/s',
        'vs_baseline': moves_per_sec / 1e7,
    }))


if __name__ == '__main__':
    main()
