"""Summarize the round-4+5 quality matrix: per-seed medians over reps.

One row per (config, seed, device-variant); the CPU and reference
columns are shared per (config, seed) across device variants (ADVICE
r4 #3 — summarize_r4 keyed P=128 cells separately and printed '—' for
their baselines).  Device variants: 'r5' = round-5 product default
(P=128 + islands + kicker), 'P128'/'P32' = the round-4 operating
points.  Device cells whose ``tpu_time_s`` overran the budget by
>--max-overrun (mid-cell tunnel/worker stalls) are excluded from
medians and listed.

Usage::

    python -m benchmarks.summarize_r5 [--flagged] [--in FILE ...]
"""

import argparse
import json
import statistics
from collections import defaultdict

DEFAULT_INPUTS = ['benchmarks/results/QUALITY_r4.jsonl',
                  'benchmarks/results/QUALITY_r5.jsonl']


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


def dev_variant(c):
    if c.get('round') == 5:
        exch = (c.get('cell_kw') or {}).get('exchange_every')
        if c['config'] != 'sycamore_fw':
            return f'r5:x{exch}' if exch is not None else 'r5'
        # Product default = periodic kick (window 10 / delta 10); the
        # early round-5 cells ran the stall-triggered point (window 60
        # / delta 0.1) before the A/B promoted the periodic one.
        kw = c.get('cell_kw') or {}
        kp = c.get('tpu_kick_params') or {}
        window = kw.get('kick_window', kp.get('window', 60))
        base = 'r5' if window == 10 else 'r5w60'
        n_walks = kw.get('n_walks')
        if n_walks and n_walks != 128:
            base += f':P{n_walks}'
        return base
    n_walks = (c.get('cell_kw') or {}).get('n_walks')
    if c['config'] == 'sycamore_fw':
        return f'P{n_walks}' if n_walks else 'P32'
    return 'r4'


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--in', dest='inputs', action='append', default=None)
    ap.add_argument('--flagged', action='store_true',
                    help='include per-rep raw values')
    ap.add_argument('--max-overrun', type=float, default=1.2)
    args = ap.parse_args()
    inputs = args.inputs or DEFAULT_INPUTS

    dev = defaultdict(list)      # (config, seed, variant) -> vals
    base = defaultdict(lambda: defaultdict(list))  # (config, seed)
    excluded = []
    for c in load(inputs):
        key = (c['config'], c['seed'])
        arm = c.get('arm')
        val = {'dev': c.get('tpu_best_log2_flops'),
               'cpu': c.get('cpu_best_log2_flops'),
               'ref': c.get('ref_best_log2_flops')}.get(arm)
        if val is None:
            continue
        budget, spent = c.get('seconds'), c.get('tpu_time_s')
        if (arm == 'dev' and budget and spent
                and spent > args.max_overrun * budget):
            excluded.append((key, c.get('rep'), float(val), spent,
                             budget))
            continue
        if arm == 'dev':
            dev[key + (dev_variant(c),)].append(float(val))
        else:
            base[key][arm].append(float(val))

    print(f"{'config(seed) variant':<28} {'dev med':>8} {'dev min':>8} "
          f"{'cpu med':>8} {'ref med':>8}  reps")
    for key in sorted(dev):
        config, seed, variant = key
        vals = dev[key]
        arms = base[(config, seed)]
        cpu, ref = arms.get('cpu', []), arms.get('ref', [])
        label = f'{config}({seed}) {variant}'
        row = (f"{label:<28} {statistics.median(vals):8.3f} "
               f"{min(vals):8.3f} ")
        row += (f"{statistics.median(cpu):8.3f} " if cpu
                else f"{'—':>8} ")
        row += (f"{statistics.median(ref):8.3f} " if ref
                else f"{'—':>8} ")
        row += f" d{len(vals)}/c{len(cpu)}/r{len(ref)}"
        print(row)
        if args.flagged:
            print('    dev: ' + ' '.join(f'{v:.3f}' for v in sorted(vals)))
            for name, xs in (('cpu', cpu), ('ref', ref)):
                if xs:
                    print(f'    {name}: '
                          + ' '.join(f'{v:.3f}' for v in sorted(xs)))
    for key, rep, val, spent, budget in excluded:
        print(f"EXCLUDED {key[0]}({key[1]}) dev rep{rep} {val:.3f}: "
              f"tpu_time_s {spent:.0f} on a {budget:.0f} s budget "
              f"(mid-cell stall)")


if __name__ == '__main__':
    main()
