"""Summarize the round-4 quality matrix: per-seed medians over reps.

Reads QUALITY_r4.jsonl (+ optionally the r3/r2 single cells as extra
draws) and prints one row per (config, seed): device median/min over
reps vs the CPU-arm median and the reference arm.

Usage::

    python -m benchmarks.summarize_r4 [--in benchmarks/results/...jsonl]
"""

import argparse
import json
import statistics
from collections import defaultdict


def load(paths):
    cells = []
    for path in paths:
        try:
            with open(path) as f:
                for line in f:
                    cells.append(json.loads(line))
        except OSError:
            pass
    return cells


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--in', dest='inputs', action='append', default=None)
    ap.add_argument('--flagged', action='store_true',
                    help='include per-rep raw values')
    ap.add_argument('--max-overrun', type=float, default=1.2,
                    help='exclude device cells whose tpu_time_s '
                         'exceeded the budget by this factor '
                         '(tunnel/worker stalls mid-cell violate the '
                         'fixed-budget protocol); they are listed '
                         'separately, not silently dropped')
    args = ap.parse_args()
    inputs = args.inputs or ['benchmarks/results/QUALITY_r4.jsonl']

    by = defaultdict(lambda: defaultdict(list))
    excluded = []
    for c in load(inputs):
        label = c['config']
        n_walks = (c.get('cell_kw') or {}).get('n_walks')
        if label == 'sycamore_fw' and n_walks not in (None, 32):
            label += f':P{n_walks}'
        key = (label, c['seed'])
        arm = c.get('arm')
        val = {'dev': c.get('tpu_best_log2_flops'),
               'cpu': c.get('cpu_best_log2_flops'),
               'ref': c.get('ref_best_log2_flops')}.get(arm)
        if val is None:
            continue
        budget, spent = c.get('seconds'), c.get('tpu_time_s')
        if (arm == 'dev' and budget and spent
                and spent > args.max_overrun * budget):
            excluded.append((key, arm, c.get('rep'), float(val),
                             spent, budget))
            continue
        by[key][arm].append(float(val))

    print(f"{'config(seed)':<18} {'dev med':>8} {'dev min':>8} "
          f"{'cpu med':>8} {'ref':>8}  reps")
    for key in sorted(by):
        arms = by[key]
        dev, cpu, ref = arms.get('dev', []), arms.get('cpu', []), \
            arms.get('ref', [])
        # ':P<n>' device variants share the base config's CPU/ref
        # baselines (ADVICE r4 #3: the P=128 rows printed '—' and the
        # headline comparison needed manual cross-row reading).
        if ':' in key[0] and not (cpu or ref):
            fallback = by.get((key[0].split(':')[0], key[1]), {})
            cpu = cpu or fallback.get('cpu', [])
            ref = ref or fallback.get('ref', [])
        row = (f"{key[0] + f'({key[1]})':<18} "
               f"{statistics.median(dev):8.3f} {min(dev):8.3f} "
               if dev else f"{key[0] + f'({key[1]})':<18} "
               f"{'—':>8} {'—':>8} ")
        row += (f"{statistics.median(cpu):8.3f} " if cpu
                else f"{'—':>8} ")
        row += (f"{statistics.median(ref):8.3f} " if ref
                else f"{'—':>8} ")
        row += f" d{len(dev)}/c{len(cpu)}/r{len(ref)}"
        print(row)
        if args.flagged:
            for arm_name, vals in (('dev', dev), ('cpu', cpu),
                                   ('ref', ref)):
                if vals:
                    print(f"    {arm_name}: "
                          + ' '.join(f'{v:.3f}' for v in sorted(vals)))
    for key, arm, rep, val, spent, budget in excluded:
        print(f"EXCLUDED {key[0]}({key[1]}) {arm} rep{rep} "
              f"{val:.3f}: tpu_time_s {spent:.0f} on a "
              f"{budget:.0f} s budget (mid-cell stall)")


if __name__ == '__main__':
    main()
