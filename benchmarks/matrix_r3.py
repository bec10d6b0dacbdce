"""Round-3 quality-matrix driver (VERDICT r2 item 3).

Runs the missing corrected-protocol cells SERIALLY (the host has one
core; concurrent arms would corrupt each other's wall-clock budgets)
and appends one JSON line per cell to ``--out``.

Phases:
  cpu  — native fixed-protocol arm cells (``quality --tpu-replicas 0``)
  ref  — actual-reference arm cells (``quality_ref``)
  dev  — device cells (needs the TPU; run with the chip idle)

Usage::

    python -m benchmarks.matrix_r3 --phase cpu,ref --out QUALITY_r3.jsonl
    python -m benchmarks.matrix_r3 --cells dev:qaoa:0,cpu:qaoa:0 ...

``--cells`` overrides the phase tables with an explicit priority-ordered
list of ``phase:config:seed`` triples (per-cell kwargs still come from
the phase tables) so a bounded session runs the most valuable cells
first.
"""

import argparse
import json
import os
import time


def _tables():
    # (phase, config, seed, kwargs)
    cpu = [
        ('cpu', 'qaoa', 0, {'n_cpu_replicas': 256}),
        ('cpu', 'sycamore', 2, {'n_cpu_replicas': 32}),
        ('cpu', 'sycamore', 3, {'n_cpu_replicas': 32}),
        ('cpu', 'sycamore_fw', 2, {'n_cpu_replicas': 32}),
        ('cpu', 'sycamore_fw', 3, {'n_cpu_replicas': 32}),
    ]
    ref = [
        ('ref', 'qaoa', 0, {}),
        ('ref', 'sycamore', 1, {}),
        ('ref', 'sycamore', 2, {}),
        ('ref', 'sycamore', 3, {}),
        ('ref', 'sycamore_fw', 2, {}),
        ('ref', 'sycamore_fw', 3, {}),
    ]
    # Device arms: protocol defaults everywhere (engine='auto' must
    # deliver the wins — VERDICT r2 item 2).  The sycamore_fw operating
    # point stays the defended B=64/P=32/update_slices=2 (round-3 60 s
    # re-probe at HEAD: P=32 63.556 vs P=128 63.817 — P=128 has 4.4x
    # the proposals/s, 1.33e6 applied/s, but worse quality; P=32 is
    # also what engine='auto' resolves to, so {} would be equivalent —
    # kept explicit for the record).
    fw_op = {'n_tpu_replicas': 64, 'n_walks': 32, 'update_slices': 2}
    dev = [
        ('dev', 'lattice', 0, {}),
        ('dev', 'regular3', 0, {}),
        ('dev', 'qaoa', 0, {}),
        ('dev', 'sycamore', 2, {}),
        ('dev', 'sycamore', 3, {}),
        ('dev', 'sycamore_fw', 0, dict(fw_op)),
        ('dev', 'sycamore_fw', 1, dict(fw_op)),
        ('dev', 'sycamore_fw', 2, dict(fw_op)),
        ('dev', 'sycamore_fw', 3, dict(fw_op)),
    ]
    table = {'cpu': cpu, 'ref': ref, 'dev': dev}
    return table


def _kwargs_for(table, ph, config, seed):
    for p, c, s, kw in table[ph]:
        if c == config and s == seed:
            return dict(kw)
    # Cell not in the default tables: fall back to the phase's kwargs
    # for the same config (any seed), else protocol defaults.
    for p, c, s, kw in table[ph]:
        if c == config:
            return dict(kw)
    return {}


def main() -> None:
    platform = os.environ.get('TNCO_TPU_PLATFORM')
    if platform:
        import jax
        jax.config.update('jax_platforms', platform)
    ap = argparse.ArgumentParser()
    ap.add_argument('--phase', default='cpu,ref')
    ap.add_argument('--cells', default=None,
                    help='priority-ordered phase:config:seed triples '
                         '(overrides --phase; kwargs from the tables)')
    ap.add_argument('--seconds', type=float, default=300.0)
    ap.add_argument('--out', default='benchmarks/results/QUALITY_r3.jsonl')
    args = ap.parse_args()
    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)

    table = _tables()
    if args.cells:
        todo = []
        for item in args.cells.split(','):
            ph, config, seed = item.strip().split(':')
            seed = int(seed)
            todo.append((ph, config, seed,
                         _kwargs_for(table, ph, config, seed)))
    else:
        todo = []
        for ph in args.phase.split(','):
            todo += table[ph.strip()]

    for ph, config, seed, kw in todo:
        t0 = time.time()
        if ph == 'ref':
            from benchmarks.quality_ref import run_reference_arm
            res = run_reference_arm(config, args.seconds, seed)
        else:
            from benchmarks.quality import run_quality
            kw = dict(kw)
            if ph == 'cpu':
                kw['n_tpu_replicas'] = 0
            else:
                kw.setdefault('n_cpu_replicas', 0)
            res = run_quality(config, args.seconds, seed, **kw)
        res['arm'] = ph
        res['seed'] = seed
        res['wall_s'] = time.time() - t0
        with open(args.out, 'a') as f:
            f.write(json.dumps(res) + '\n')
        keys = ('tpu_best_log2_flops', 'cpu_best_log2_flops',
                'ref_best_log2_flops')
        best = {k: res[k] for k in keys if res.get(k) is not None}
        print(json.dumps({'arm': ph, 'config': config, 'seed': seed,
                          **best}), flush=True)


if __name__ == '__main__':
    main()
