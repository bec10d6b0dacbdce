"""Convoy diagnostic for the walk-family engines (round 4).

Hypothesis (VERDICT r3 item 1 / docs/ROADMAP.md P-degradation): when a
walk's accepted proposal is DISCARDED by the claim filter, the walk
still advances (``pos = a``) — so two walks that collide at the same
node B both advance to the same parent A and collide again at every
subsequent level ("convoy").  On deep width-capped trees (leaf-to-root
paths share long suffixes) a convoy never separates until the root,
wasting one walk's whole remaining climb and breaking the chained-move
semantics the engine exists for.

This probe measures the signature directly: the fraction of live walks
whose position EQUALS a lower-index walk's position in the same
replica (duplicate-position rate), alongside the applied/proposed
ratio.  Random independent positions on an N-node tree would collide
at ~P/N (< 1% here); convoying drives the duplicate rate far higher.

Usage::

    TNCO_TPU_PLATFORM=cpu python -m benchmarks.convoy_probe \
        --config sycamore_fw --replicas 4 --n-walks 32 --chunks 8
"""

import argparse
import json
import os
import time

import numpy as np


def main() -> None:
    platform = os.environ.get('TNCO_TPU_PLATFORM')
    if platform:
        import jax
        jax.config.update('jax_platforms', platform)
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', default='sycamore_fw')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--replicas', type=int, default=4)
    ap.add_argument('--n-walks', type=int, default=32)
    ap.add_argument('--chunks', type=int, default=8)
    ap.add_argument('--chunk-sweeps', type=int, default=64)
    ap.add_argument('--update-slices', type=int, default=2)
    ap.add_argument('--beta-max', type=float, default=60.0)
    ap.add_argument('--on-block', default=None,
                    help="walk scheduling on conflict discard "
                         "('advance' | 'restart'; default: engine "
                         "default)")
    args = ap.parse_args()

    from benchmarks.run import build_config
    from tnco_tpu.ctree import ContractionTree
    from tnco_tpu.utils.tn import get_random_contraction_path

    (ts_inds, output_inds, dims), max_width = build_config(
        args.config, args.seed)
    order = tuple(dict.fromkeys(x for xs in ts_inds for x in xs))
    paths = [
        get_random_contraction_path(ts_inds, output_inds,
                                    merge_paths=False,
                                    seed=args.seed + r)
        for r in range(min(32, args.replicas))
    ]

    def tree(r):
        return ContractionTree([p for p in paths[r % len(paths)] if p][0],
                               ts_inds, dims, output_inds=output_inds,
                               check_shared_inds=True, inds_order=order)

    ctrees = [tree(r) for r in range(args.replicas)]
    kw = {}
    if args.on_block is not None:
        kw['on_block'] = args.on_block
    if max_width is not None:
        from tnco_tpu.optimize.finite_width import SimpleCostModel
        from tnco_tpu.parallel.replicas import ReplicaRunnerFW
        runner = ReplicaRunnerFW(ctrees, list(range(args.replicas)),
                                 cmodel=SimpleCostModel(
                                     max_width=max_width),
                                 engine='walks',
                                 n_walks=args.n_walks, **kw)
        run_kw = {'update_slices': args.update_slices}
    else:
        from tnco_tpu.optimize.infinite_memory import SimpleCostModel
        from tnco_tpu.parallel.replicas import ReplicaRunner
        runner = ReplicaRunner(ctrees, list(range(args.replicas)),
                               cmodel=SimpleCostModel(),
                               engine='walks', n_walks=args.n_walks,
                               **kw)
        run_kw = {}

    cs = args.chunk_sweeps
    t0 = time.perf_counter()
    prev_moves = prev_applied = 0
    for i in range(args.chunks):
        betas = np.linspace(i / args.chunks * args.beta_max,
                            (i + 1) / args.chunks * args.beta_max,
                            cs).astype(np.float32)
        runner.run(betas, chunk_size=cs, **run_kw)
        pos = np.asarray(runner._mw_pos)                    # [P, B]
        live = pos >= 0
        # Walk p duplicates a lower-index walk's position.
        dup = np.zeros_like(live)
        for b in range(pos.shape[1]):
            _, first = np.unique(pos[:, b], return_index=True)
            mask = np.ones(pos.shape[0], bool)
            mask[first] = False
            dup[:, b] = mask & live[:, b]
        moves = runner.moves_done - prev_moves
        applied = (runner.applied_done or 0) - prev_applied
        prev_moves, prev_applied = (runner.moves_done,
                                    runner.applied_done or 0)
        print(json.dumps({
            'chunk': i,
            'dup_rate': float(dup.sum() / max(1, live.sum())),
            'live_rate': float(live.mean()),
            'applied_rate': float(applied / max(1, moves)),
            'best': float(np.min(runner.log2_min_totals())),
            'elapsed_s': round(time.perf_counter() - t0, 1),
        }), flush=True)


if __name__ == '__main__':
    main()
