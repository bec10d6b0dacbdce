"""Proposal-normalized parity curves (VERDICT r2 item 5).

Reads the matrix cells (``benchmarks/results/QUALITY_r3.jsonl``) and
prints, per config/seed, the best log2(flops) each arm had reached at
matched cumulative-proposal budgets — the comparison the 1-core host
cancels out of (BASELINE.md's quality bar is the reference on a
64-thread fleet; wall-clock cells on one core cannot express that,
quality-per-proposal can).

The CPU arm is the comparator: its proposal counts are exact (the
native engine counts every Metropolis draw, like the reference's
optimizer.hpp:103-192 loop), and QUALITY.md's kernel-parity note shows
it matches the actual reference per-protocol.  The reference arm's own
curve is sweep-indexed (one sweep = one leaf-to-root walk of
data-dependent length), so it is reported separately at its final
sweep count rather than interpolated.

Usage::

    python -m benchmarks.parity_curves \
        [--in benchmarks/results/QUALITY_r3.jsonl]
"""

import argparse
import bisect
import json
from collections import defaultdict


def _best_at(curve, n_proposals):
    """Best value the arm had reached by ``n_proposals`` (or None)."""
    xs = [p for p, _ in curve]
    i = bisect.bisect_right(xs, n_proposals)
    if i == 0:
        return None
    return min(v for _, v in curve[:i])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--in', dest='path',
                    default='benchmarks/results/QUALITY_r3.jsonl')
    ap.add_argument('--points', type=int, default=6,
                    help='matched budgets per config (log-spaced over '
                         'the shorter arm)')
    args = ap.parse_args()

    cells = defaultdict(dict)
    with open(args.path) as f:
        for line in f:
            r = json.loads(line)
            key = (r['config'], r.get('seed'))
            cells[key][r['arm']] = r

    for (config, seed), arms in sorted(cells.items()):
        dev, cpu = arms.get('dev'), arms.get('cpu')
        if not (dev and dev.get('tpu_curve') and cpu
                and cpu.get('cpu_curve')):
            continue
        d_max = dev['tpu_curve'][-1][0]
        c_max = cpu['cpu_curve'][-1][0]
        lo = max(dev['tpu_curve'][0][0], cpu['cpu_curve'][0][0])
        hi = min(d_max, c_max)
        if hi <= lo:
            continue
        if args.points <= 1:
            budgets = [hi]
        else:
            budgets = sorted(
                {int(lo * (hi / lo) ** (k / (args.points - 1)))
                 for k in range(args.points)})
        rows = []
        for b in budgets:
            rows.append({'proposals': b,
                         'device': _best_at(dev['tpu_curve'], b),
                         'cpu': _best_at(cpu['cpu_curve'], b)})
        # Device proposal counts include conflict-discarded walks
        # (~45% on the walks engine); emit the applied-move rate next
        # to them so the speed_ratio can be read both ways.
        applied = dev.get('tpu_applied')
        out = {'config': config, 'seed': seed,
               'device_proposals_per_s': d_max / dev['tpu_time_s'],
               'device_applied_per_s': (
                   None if applied is None
                   else applied / dev['tpu_time_s']),
               'cpu_proposals_per_s': c_max / cpu['cpu_time_s'],
               'speed_ratio': (d_max / dev['tpu_time_s']) /
                              (c_max / cpu['cpu_time_s']),
               'matched_budget_rows': rows}
        ref = arms.get('ref')
        if ref:
            out['reference_final'] = {
                'sweeps': ref.get('ref_sweeps'),
                'best': ref.get('ref_best_log2_flops')}
        print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
