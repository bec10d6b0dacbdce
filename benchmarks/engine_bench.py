"""Single-chip engine throughput on Sycamore-scale shapes.

Usage::

    python -m benchmarks.engine_bench --engine walker --replicas 256 \
        --n-walks 128 [--walk-chunk 0] [--iters 64] [--config sycamore]

Prints proposals/s, applied/s and ms/iteration for one engine at one
shape, measured inside a single jitted scan (per-call tunnel overhead
excluded; see docs/ROADMAP.md measurement notes).
"""

import argparse
import time

import numpy as np


def main() -> None:
    # Mirror the CLI's platform override (sitecustomize pins
    # JAX_PLATFORMS=axon; the env var alone may not stick).
    import os
    platform = os.environ.get('TNCO_TPU_PLATFORM')
    if platform:
        import jax
        jax.config.update('jax_platforms', platform)
    ap = argparse.ArgumentParser()
    ap.add_argument('--engine', default='walker',
                    help="'walker' | 'multiwalk' | 'sweep' | 'walks'")
    ap.add_argument('--claim', default='sequential',
                    help="walks engine conflict filter: 'sequential' | "
                         "'pairwise'")
    ap.add_argument('--config', default='sycamore')
    ap.add_argument('--replicas', type=int, default=256)
    ap.add_argument('--n-walks', type=int, default=128)
    ap.add_argument('--walk-chunk', type=int, default=0)
    ap.add_argument('--iters', type=int, default=64)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--update-slices', type=int, default=0,
                    help='FW reslice cadence in iterations (0 = never). '
                         'Finite-width mode is selected by the config '
                         '(e.g. sycamore_fw / qaoa carry a max_width).')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from benchmarks.run import build_config
    from tnco_tpu.ctree import ContractionTree
    from tnco_tpu.kernels import sa_batched as sb
    from tnco_tpu.kernels.sa_infinite import SweepConfig
    from tnco_tpu.ops import bitops
    from tnco_tpu.utils.tn import get_random_contraction_path

    (ts_inds, output_inds, dims), max_width = build_config(
        args.config, args.seed)
    order = tuple(dict.fromkeys(x for xs in ts_inds for x in xs))
    n_paths = min(args.replicas, 8)
    paths = [
        get_random_contraction_path(ts_inds, output_inds,
                                    merge_paths=False, seed=args.seed + r)
        for r in range(n_paths)
    ]
    trees = [
        ContractionTree([p for p in paths[r] if p][0], ts_inds, dims,
                        output_inds=output_inds, check_shared_inds=True,
                        inds_order=order) for r in range(n_paths)
    ]
    ctrees = [trees[r % n_paths] for r in range(args.replicas)]
    template = ctrees[0]
    n_lanes = template.inds_array.shape[1]
    cfg = SweepConfig(n_leaves=template.n_leaves, n_lanes=n_lanes)
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    print(f'N={len(template)} lanes={n_lanes} B={args.replicas} '
          f'P={args.n_walks} wc={args.walk_chunk} engine={args.engine}'
          + (f' FW(max_width={max_width}, upd={args.update_slices})'
             if max_width is not None else ''),
          flush=True)
    if max_width is not None:
        _bench_fw(args, ctrees, max_width)
        return
    t0 = time.perf_counter()
    batch = sb.init_batch(ctrees, list(range(args.replicas)),
                          np.asarray(log2d))
    jax.block_until_ready(batch.lcc)
    np.asarray(batch.min_log2_total)
    print(f'batch built+uploaded in {time.perf_counter()-t0:.1f}s',
          flush=True)

    pos = jnp.full((args.n_walks, args.replicas), -1, dtype=jnp.int32)
    betas = jnp.linspace(0.0, 30.0, args.iters, dtype=jnp.float32)

    def run(b, pos_):
        if args.engine == 'sweep':
            from tnco_tpu.kernels import sa_fullsweep as sfs
            return sfs.run_fullsweep(
                b, betas, log2d_w32, cfg,
                uniform_log2=sfs.uniform_log2_dim(
                    template.log2_dims_array))
        if args.engine == 'walker':
            from tnco_tpu.kernels import pallas_walker as pw
            return pw.run_walker(b, betas, log2d_w32, cfg, args.n_walks,
                                 pos_)
        if args.engine == 'walks':
            from tnco_tpu.kernels import sa_fullsweep as sfs
            from tnco_tpu.kernels import sa_walks as swk
            return swk.run_walks(
                b, betas, log2d_w32, cfg, pos_, claim=args.claim,
                uniform_log2=sfs.uniform_log2_dim(
                    template.log2_dims_array))
        from tnco_tpu.kernels import sa_multiwalk as smw
        return smw.run_multiwalk(b, betas, log2d_w32, cfg, args.n_walks,
                                 pos_, walk_chunk=args.walk_chunk)

    t0 = time.perf_counter()
    out, m = run(batch, pos)
    int(m['moves'])
    print(f'compile+run1: {time.perf_counter()-t0:.1f}s', flush=True)

    t0 = time.perf_counter()
    out, m = run(batch, pos)
    moves, applied = int(m['moves']), int(m['applied'])
    dt = time.perf_counter() - t0
    print(f'proposals/s: {moves/dt:.3e}  applied/s: {applied/dt:.3e}  '
          f'frac: {applied/max(moves,1):.2f}  '
          f'iter_ms: {dt/args.iters*1000:.2f}  '
          f'best: {float(jnp.min(out.min_log2_total)):.3f}')


def _bench_fw(args, ctrees, max_width) -> None:
    """Finite-width engine throughput through the production runner.

    Times one full ``ReplicaRunnerFW.run`` over ``--iters`` betas (one
    jitted chunk) after a warm-up call, so the number isolates the FW
    per-iteration cost; ``--update-slices 0`` disables the periodic
    greedy reslice to split base-iteration cost from reslice cost.
    """
    import jax.numpy as jnp

    from tnco_tpu.optimize.finite_width import SimpleCostModel
    from tnco_tpu.parallel.replicas import ReplicaRunnerFW

    t0 = time.perf_counter()
    runner = ReplicaRunnerFW(ctrees, list(range(len(ctrees))),
                             cmodel=SimpleCostModel(max_width=max_width),
                             engine=args.engine, n_walks=args.n_walks,
                             walk_chunk=args.walk_chunk)
    print(f'runner built in {time.perf_counter()-t0:.1f}s', flush=True)
    betas = jnp.linspace(0.0, 30.0, args.iters,
                         dtype=np.asarray(runner.log2d).dtype)

    def once():
        t0 = time.perf_counter()
        out = runner.run(betas, update_slices=args.update_slices,
                         chunk_size=args.iters)
        dt = time.perf_counter() - t0
        return out, dt

    _, dt1 = once()
    print(f'compile+run1: {dt1:.1f}s', flush=True)
    moves0 = runner.moves_done
    out, dt = once()
    moves = runner.moves_done - moves0
    print(f'proposals/s: {moves/dt:.3e}  '
          f'iter_ms: {dt/args.iters*1000:.2f}  '
          f'best: {float(np.min(out["log2_min_total"])):.3f}',
          flush=True)


if __name__ == '__main__':
    main()
