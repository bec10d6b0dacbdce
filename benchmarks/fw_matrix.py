"""Adaptive (n_walks, update_slices, replicas) tuning for the FW
device arm: short quality runs over a small matrix, then one long run
at the winning configuration.

Usage::

    python -m benchmarks.fw_matrix --config sycamore_fw \
        --short-seconds 90 --long-seconds 300 --seed 0

Emits one JSON line per run plus a final ``{"winner": ...}`` line.
"""

import argparse
import json
import os


def main() -> None:
    platform = os.environ.get('TNCO_TPU_PLATFORM')
    if platform:
        import jax
        jax.config.update('jax_platforms', platform)
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', default='sycamore_fw')
    ap.add_argument('--engine', default='walks')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--short-seconds', type=float, default=90.0)
    ap.add_argument('--long-seconds', type=float, default=300.0)
    ap.add_argument('--replicas', type=int, default=64)
    ap.add_argument('--grid', default='8:10,16:5,32:2,64:1,64:4',
                    help='comma list of n_walks:update_slices cells')
    # Defended default (docs/QUALITY.md): exchange every 4 chunks won
    # the sycamore_fw 300 s arm (63.805 vs 64.62 without exchange).
    # NOTE: the cadence applies to the short grid cells too, although it
    # was validated only at the P=32/update_slices=2 operating point —
    # pass 0 to reproduce the original (exchange-off) grid selection.
    ap.add_argument('--exchange-every', type=int, default=4,
                    help='Population exchange cadence; also applied to '
                         'the short grid-selection cells (validated at '
                         'P=32/upd=2 only; 0 restores the exchange-off '
                         'selection protocol).')
    args = ap.parse_args()

    from benchmarks.quality import run_quality

    cells = []
    for cell in args.grid.split(','):
        p, upd = cell.split(':')
        cells.append((int(p), int(upd)))

    results = []
    for p, upd in cells:
        res = run_quality(args.config, args.short_seconds, args.seed,
                          args.replicas, 0, engine=args.engine,
                          n_walks=p, update_slices=upd,
                          exchange_every=args.exchange_every)
        res['n_walks'] = p
        res['update_slices'] = upd
        print(json.dumps(res), flush=True)
        results.append(res)

    best = min(results, key=lambda r: r['tpu_best_log2_flops'])
    final = run_quality(args.config, args.long_seconds, args.seed,
                        args.replicas, 0, engine=args.engine,
                        n_walks=best['n_walks'],
                        update_slices=best['update_slices'],
                        exchange_every=args.exchange_every)
    final['n_walks'] = best['n_walks']
    final['update_slices'] = best['update_slices']
    print(json.dumps({'winner': final}), flush=True)


if __name__ == '__main__':
    main()
