"""Walk-schedule A/B probe for the FW flagship (VERDICT r3 item 1).

The round-3 matrix showed the walks-FW device arm losing to the fixed
CPU arm by 2.0-2.4 bits on held-out seeds 2/3 (and 3-6 bits at matched
proposal counts) while winning the tuned seeds 0/1 — a per-proposal
search-quality defect.  Prime suspects: (a) the claim filter's conflict
discard compounding with depth ("convoys", benchmarks/convoy_probe.py),
(b) exchange_every=4 over-concentrating the population on unlucky
seeds, (c) reslice cadence.  This probe runs the SAME replica set
(trees built once — the dominant setup cost at Sycamore scale) through
schedule variants at a fixed budget, one JSON line per variant.

Usage::

    python -m benchmarks.fw_schedule_probe --config sycamore_fw \
        --seed 2 --seconds 120 \
        --variants advance:4,advance:0,restart:4,dedup:4
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
    ap.add_argument('--seed', type=int, default=2)
    ap.add_argument('--seconds', type=float, default=120.0)
    ap.add_argument('--replicas', type=int, default=64)
    ap.add_argument('--n-walks', type=int, default=32)
    ap.add_argument('--update-slices', type=int, default=2)
    ap.add_argument('--chunk-sweeps', type=int, default=256)
    ap.add_argument('--beta-max', type=float, default=60.0)
    ap.add_argument('--variants', default='advance:4,advance:0,'
                                          'restart:4,dedup:4',
                    help='comma list of on_block:exchange_every cells')
    ap.add_argument('--out', default=None,
                    help='append one JSON line per variant')
    args = ap.parse_args()

    from benchmarks.run import build_config
    from tnco_tpu.ctree import ContractionTree
    from tnco_tpu.optimize.finite_width import SimpleCostModel
    from tnco_tpu.parallel.replicas import (_LANE_MAJOR, ReplicaRunnerFW,
                                            exchange_best_fw)
    from tnco_tpu.utils.tn import get_random_contraction_path

    (ts_inds, output_inds, dims), max_width = build_config(
        args.config, args.seed)
    assert max_width is not None, 'FW probe needs a width-capped config'
    order = tuple(dict.fromkeys(x for xs in ts_inds for x in xs))
    n_paths = 32
    t_setup = time.perf_counter()
    paths = [
        get_random_contraction_path(ts_inds, output_inds,
                                    merge_paths=False,
                                    seed=args.seed + r)
        for r in range(n_paths)
    ]
    ctrees = [
        ContractionTree([p for p in paths[r % n_paths] if p][0],
                        ts_inds, dims, output_inds=output_inds,
                        check_shared_inds=True, inds_order=order)
        for r in range(args.replicas)
    ]
    print(json.dumps({'setup': 'trees',
                      'wall_s': round(time.perf_counter() - t_setup, 1)}),
          flush=True)
    cmodel = SimpleCostModel(max_width=max_width)
    cs = args.chunk_sweeps

    for cell in args.variants.split(','):
        on_block, exch = cell.strip().split(':')
        exch = int(exch)
        t_v = time.perf_counter()
        runner = ReplicaRunnerFW(ctrees, list(range(args.replicas)),
                                 cmodel=cmodel, engine='walks',
                                 n_walks=args.n_walks, on_block=on_block)
        runner.run(np.zeros(cs, dtype=np.float32), chunk_size=cs,
                   update_slices=args.update_slices)
        runner.moves_done = 0
        runner.applied_done = None
        setup_s = time.perf_counter() - t_v
        curve = []
        t0 = time.perf_counter()
        n_calls = 0
        while True:
            frac0 = (time.perf_counter() - t0) / args.seconds
            if frac0 >= 1.0:
                break
            betas = np.linspace(min(frac0, 1.0) * args.beta_max,
                                min(frac0 + 0.05, 1.0) * args.beta_max,
                                cs).astype(np.float32)
            runner.run(betas, chunk_size=cs,
                       update_slices=args.update_slices)
            n_calls += 1
            if (exch and runner.states is not None and
                    n_calls % exch == 0 and runner.engine in _LANE_MAJOR):
                runner.states = exchange_best_fw(runner.states)
            curve.append([int(runner.moves_done),
                          float(np.min(runner.log2_min_totals()))])
        row = {
            'config': args.config,
            'seed': args.seed,
            'on_block': on_block,
            'exchange_every': exch,
            'replicas': args.replicas,
            'n_walks': args.n_walks,
            'update_slices': args.update_slices,
            'seconds': args.seconds,
            'best': float(np.min(runner.log2_min_totals())),
            'moves': int(runner.moves_done),
            'applied': (None if runner.applied_done is None else
                        int(runner.applied_done)),
            'time_s': round(time.perf_counter() - t0, 1),
            'setup_s': round(setup_s, 1),
            'curve': curve,
        }
        if args.out:
            with open(args.out, 'a') as f:
                f.write(json.dumps(row) + '\n')
        brief = {k: v for k, v in row.items() if k != 'curve'}
        print(json.dumps(brief), flush=True)


if __name__ == '__main__':
    main()
