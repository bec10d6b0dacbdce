"""Round-5 quality-matrix driver (VERDICT r4 items 1, 2, 5).

Extends the round-4 repeated-cell protocol (independent PRNG streams
via ``run_seed_offset = rep * 100003``, per-seed medians — see
benchmarks/matrix_r4.py) to:

- the POST-FIX product default on the FW flagship (walks P=128 +
  island exchange + stall kicker, all via driver defaults) on ALL four
  seeds — the fix-validation and matrix-completion cells in one phase;
- a REPEATED reference arm (the round-4 matrix compared device medians
  against round-3 single ref draws — unsound by round 4's own noise
  doctrine; ``quality_ref`` now re-keys chains per rep);
- repeated cells for the non-flagship configs (lattice / regular3 /
  qaoa), whose round-3 rows were single draws with margins below the
  established noise band;
- explicit per-cell keyword overrides in the cell syntax (ADVICE r4
  #4: the phase-prefix overloading of matrix_r4 made it easy to re-run
  a P=128 cell at the retracted P=32 point by mistake).

Cell syntax: ``arm:config:seed[:rep][:k=v[,k=v...]]`` — e.g.
``dev:sycamore_fw:1:2:n_walks=128,exchange_islands=4``.  Values go
through ``ast.literal_eval``; unprefixed phases supply the product
defaults (device cells carry NO hand-picked engine knobs — the driver
resolves them, which is exactly what a user gets).

Usage::

    python -m benchmarks.matrix_r5 --phase fw_fix --out ...
    python -m benchmarks.matrix_r5 --cells ref:sycamore_fw:0:1 ...
"""

import argparse
import ast
import json
import os
import time

CPU_KW = {
    'sycamore': {'n_cpu_replicas': 32},
    'sycamore_fw': {'n_cpu_replicas': 32},
}


def _phases():
    # Post-fix flagship: product defaults end to end (engine='auto'
    # resolves walks/P=128; quality.py resolves islands=B//16 and the
    # kicker).  Seeds 0/2 validate the fix against the round-4 stuck
    # reps; seeds 1/3 complete the P=128 half of the matrix.
    fw_fix = [('dev', 'sycamore_fw', s, rep, {})
              for s in (0, 2, 1, 3) for rep in (0, 1, 2)]
    # Like-for-like reference arm: 3 reps x 4 seeds on the flagship.
    ref_fw = [('ref', 'sycamore_fw', s, rep, {})
              for s in (0, 1, 2, 3) for rep in (0, 1, 2)]
    # Clean all-round-4-protocol CPU medians (rep 0 under the repeated
    # protocol; reps 1-2 exist in QUALITY_r4.jsonl).
    cpu_fw0 = [('cpu', 'sycamore_fw', s, 0, dict(CPU_KW['sycamore_fw']))
               for s in (0, 1, 2, 3)]
    # Non-flagship configs, every arm repeated (seeds 0-1, 3 reps).
    small = [(ph, c, s, rep, {})
             for c in ('lattice', 'regular3', 'qaoa')
             for s in (0, 1)
             for ph in ('dev', 'cpu', 'ref')
             for rep in (0, 1, 2)]
    return {'fw_fix': fw_fix, 'ref_fw': ref_fw, 'cpu_fw0': cpu_fw0,
            'small': small}


def run_cell(ph, config, seed, rep, kw, seconds):
    t0 = time.time()
    offset = rep * 100003
    if ph == 'ref':
        from benchmarks.quality_ref import run_reference_arm
        res = run_reference_arm(config, seconds, seed,
                                run_seed_offset=offset, **kw)
    else:
        from benchmarks.quality import run_quality
        kw = dict(kw)
        if ph == 'cpu':
            kw['n_tpu_replicas'] = 0
            kw.setdefault('n_cpu_replicas',
                          CPU_KW.get(config, {}).get('n_cpu_replicas',
                                                     256))
        else:
            kw.setdefault('n_cpu_replicas', 0)
        res = run_quality(config, seconds, seed, run_seed_offset=offset,
                          **kw)
    res['arm'] = ph
    res['seed'] = seed
    res['rep'] = rep
    res['cell_kw'] = kw
    res['round'] = 5
    res['wall_s'] = time.time() - t0
    return res


def parse_cells(spec: str):
    todo = []
    for item in spec.split(';') if ';' in spec else spec.split():
        item = item.strip()
        if not item:
            continue
        parts = item.split(':')
        ph, config, seed = parts[0], parts[1], int(parts[2])
        rep, kw = 0, {}
        for extra in parts[3:]:
            if '=' in extra:
                for pair in extra.split(','):
                    k, _, v = pair.partition('=')
                    kw[k.strip()] = ast.literal_eval(v)
            else:
                rep = int(extra)
        if ph == 'cpu':
            for k, v in CPU_KW.get(config, {}).items():
                kw.setdefault(k, v)
        todo.append((ph, config, seed, rep, kw))
    return todo


def main() -> None:
    platform = os.environ.get('TNCO_TPU_PLATFORM')
    if platform:
        import jax
        jax.config.update('jax_platforms', platform)
    from benchmarks.quality import _enable_cache
    _enable_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument('--phase', default=None,
                    help='comma list of fw_fix,ref_fw,cpu_fw0,small')
    ap.add_argument('--cells', default=None,
                    help="space/';'-separated arm:config:seed[:rep]"
                         "[:k=v,...] items (overrides --phase)")
    ap.add_argument('--seconds', type=float, default=300.0)
    ap.add_argument('--out',
                    default='benchmarks/results/QUALITY_r5.jsonl')
    args = ap.parse_args()
    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)

    if args.cells:
        todo = parse_cells(args.cells)
    else:
        table = _phases()
        todo = []
        for phase in (args.phase or 'fw_fix').split(','):
            todo += table[phase.strip()]

    for ph, config, seed, rep, kw in todo:
        res = run_cell(ph, config, seed, rep, kw, args.seconds)
        with open(args.out, 'a') as f:
            f.write(json.dumps(res) + '\n')
        keys = ('tpu_best_log2_flops', 'cpu_best_log2_flops',
                'ref_best_log2_flops', 'tpu_setup_s', 'tpu_islands')
        best = {k: res[k] for k in keys if res.get(k) is not None}
        if res.get('tpu_kicks') is not None:
            best['n_kicks'] = len(res['tpu_kicks'])
        print(json.dumps({'arm': ph, 'config': config, 'seed': seed,
                          'rep': rep, **best}), flush=True)


if __name__ == '__main__':
    main()
