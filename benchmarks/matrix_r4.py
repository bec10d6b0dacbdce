"""Round-4 quality-matrix driver (VERDICT r3 items 1 and 4).

Round 3's single 300 s cells are noisy by multiple bits run-to-run
(the wall-clock-driven anneal schedule makes the SA trajectory
chaotic in the chunk boundaries — the same seed-2 sycamore_fw config
read 65.87 in QUALITY_r3.jsonl and 63.35/63.54 in FW_SCHED_PROBE_r4),
so round 4 repeats every flagship cell with independent PRNG streams
(``run_seed_offset = rep * 100003``; same problem instance) and
reports the per-seed MEDIAN.  Cells run SERIALLY (one host core).

Usage::

    python -m benchmarks.matrix_r4 --cells dev:sycamore_fw:0:1 ...
    python -m benchmarks.matrix_r4 --phase fw_dev --out ...

Cell syntax: ``phase:config:seed[:rep]`` (rep defaults to 0; rep 0 is
the historical stream, matching rounds 2-3 cells).
"""

import argparse
import json
import os
import time

# Product defaults everywhere (engine='auto' must deliver the wins).
# FW_OP pins the round-2/3 P=32 operating point for continuity with
# those rounds' cells; the fw_p128 phase measures the P=128 point that
# became the product default ('auto' now resolves n_walks=128 for
# walks-FW) after this matrix showed its medians win where P=32 loses.
FW_OP = {'n_tpu_replicas': 64, 'n_walks': 32, 'update_slices': 2}

CPU_KW = {
    'qaoa': {'n_cpu_replicas': 256},
    'lattice': {'n_cpu_replicas': 256},
    'regular3': {'n_cpu_replicas': 256},
    'sycamore': {'n_cpu_replicas': 32},
    'sycamore_fw': {'n_cpu_replicas': 32},
}


def _phases():
    fw_dev = [('dev', 'sycamore_fw', s, rep, dict(FW_OP))
              for s in (0, 1, 2, 3) for rep in (0, 1, 2)]
    fw_cpu = [('cpu', 'sycamore_fw', s, rep, dict(CPU_KW['sycamore_fw']))
              for s in (0, 1, 2, 3) for rep in (1, 2)]
    im3 = [('dev', 'sycamore', 3, 0, {}),
           ('cpu', 'sycamore', 3, 0, dict(CPU_KW['sycamore'])),
           ('ref', 'sycamore', 3, 0, {})]
    held1 = [(ph, c, 1, 0, {}) for c in ('lattice', 'regular3', 'qaoa')
             for ph in ('dev', 'cpu', 'ref')]
    # VERDICT r3 item 3: is P=128 (4.3x the proposal rate, applied/s
    # bar met — FW_SCALE_PROBE_r4.jsonl) non-inferior to P=32 at
    # 300 s?  Repeated cells at two seeds, same median protocol.
    p128 = dict(FW_OP, n_walks=128)
    fw_p128 = [('dev', 'sycamore_fw', s, rep, dict(p128))
               for s in (0, 2) for rep in (0, 1, 2)]
    return {'fw_dev': fw_dev, 'fw_cpu': fw_cpu, 'im3': im3,
            'held1': held1, 'fw_p128': fw_p128}


def run_cell(ph, config, seed, rep, kw, seconds):
    t0 = time.time()
    if ph == 'ref':
        from benchmarks.quality_ref import run_reference_arm
        res = run_reference_arm(config, seconds, seed)
    else:
        from benchmarks.quality import run_quality
        kw = dict(kw)
        if ph == 'cpu':
            kw['n_tpu_replicas'] = 0
        else:
            kw.setdefault('n_cpu_replicas', 0)
        if ph == 'cpu':
            kw.setdefault('n_cpu_replicas',
                          CPU_KW.get(config, {}).get('n_cpu_replicas', 256))
        res = run_quality(config, seconds, seed,
                          run_seed_offset=rep * 100003, **kw)
    res['arm'] = ph
    res['seed'] = seed
    res['rep'] = rep
    res['cell_kw'] = kw
    res['wall_s'] = time.time() - t0
    return res


def main() -> None:
    platform = os.environ.get('TNCO_TPU_PLATFORM')
    if platform:
        import jax
        jax.config.update('jax_platforms', platform)
    from benchmarks.quality import _enable_cache
    _enable_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument('--phase', default=None,
                    help='comma list of fw_dev,fw_cpu,im3,held1')
    ap.add_argument('--cells', default=None,
                    help='priority-ordered phase:config:seed[:rep] '
                         'items (overrides --phase)')
    ap.add_argument('--seconds', type=float, default=300.0)
    ap.add_argument('--out', default='benchmarks/results/QUALITY_r4.jsonl')
    args = ap.parse_args()
    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)

    table = _phases()
    todo = []
    if args.cells:
        for item in args.cells.split(','):
            parts = item.strip().split(':')
            ph, config, seed = parts[0], parts[1], int(parts[2])
            rep = int(parts[3]) if len(parts) > 3 else 0
            if ph == 'p128':  # fw_p128 phase cells (VERDICT r3 item 3)
                ph, kw = 'dev', dict(FW_OP, n_walks=128)
            elif ph == 'dev' and config == 'sycamore_fw':
                kw = dict(FW_OP)
            elif ph == 'cpu':
                kw = dict(CPU_KW.get(config, {}))
            else:
                kw = {}
            todo.append((ph, config, seed, rep, kw))
    else:
        for phase in (args.phase or 'fw_dev').split(','):
            todo += table[phase.strip()]

    for ph, config, seed, rep, kw in todo:
        res = run_cell(ph, config, seed, rep, kw, args.seconds)
        with open(args.out, 'a') as f:
            f.write(json.dumps(res) + '\n')
        keys = ('tpu_best_log2_flops', 'cpu_best_log2_flops',
                'ref_best_log2_flops', 'tpu_setup_s')
        best = {k: res[k] for k in keys if res.get(k) is not None}
        print(json.dumps({'arm': ph, 'config': config, 'seed': seed,
                          'rep': rep, **best}), flush=True)


if __name__ == '__main__':
    main()
