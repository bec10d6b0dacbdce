"""Equal-iteration CPU probe: accept_rule='round' vs 'chained'.

The round-2 method (B=4 CPU probes on a width-capped Sycamore-shaped
network) applied to the new chained-acceptance rule: same seeds, same
linear schedule, same iteration count — only the acceptance rule (and
optionally on_block / P) varies, so any best-cost gap is the rule, not
throughput.  Reduced m keeps a CPU cell in minutes.

Usage::

    TNCO_TPU_PLATFORM=cpu python -m benchmarks.chained_probe \
        --m 8 --iters 4000 --n-walks 32 --out /tmp/chained_probe.jsonl
"""

import argparse
import itertools
import json
import os
import time


def run_cell(m, iters, n_walks, accept_rule, on_block, seed, max_width,
             replicas):
    import numpy as np

    from benchmarks import networks
    from tnco_tpu.ctree import ContractionTree
    from tnco_tpu.optimize.finite_width import SimpleCostModel
    from tnco_tpu.parallel.replicas import ReplicaRunnerFW
    from tnco_tpu.utils.tn import get_random_contraction_path

    ts_inds, output_inds, dims = networks.sycamore_like_tn(m, seed)
    order = tuple(dict.fromkeys(x for xs in ts_inds for x in xs))
    ctrees = []
    for r in range(replicas):
        paths = get_random_contraction_path(ts_inds, output_inds,
                                            merge_paths=False,
                                            seed=seed + r)
        (path,) = [p for p in paths if p]
        ctrees.append(
            ContractionTree(path, ts_inds, dims, output_inds=output_inds,
                            check_shared_inds=True, inds_order=order))
    runner = ReplicaRunnerFW(ctrees, list(range(replicas)),
                             cmodel=SimpleCostModel(max_width=max_width),
                             engine='walks', n_walks=n_walks,
                             on_block=on_block, accept_rule=accept_rule)
    betas = np.linspace(0.0, 60.0, iters, dtype=np.float32)
    t0 = time.perf_counter()
    runner.run(betas, chunk_size=min(512, iters), update_slices=2)
    lm = runner.log2_min_totals()
    return {
        'm': m, 'iters': iters, 'n_walks': n_walks,
        'accept_rule': accept_rule, 'on_block': on_block, 'seed': seed,
        'replicas': replicas, 'best': float(np.min(lm)),
        'median': float(np.median(lm)),
        'applied': int(runner.applied_done),
        'moves': int(runner.moves_done),
        'wall_s': time.perf_counter() - t0,
    }


def main() -> None:
    platform = os.environ.get('TNCO_TPU_PLATFORM')
    if platform:
        import jax
        jax.config.update('jax_platforms', platform)
    ap = argparse.ArgumentParser()
    ap.add_argument('--m', type=int, default=8)
    ap.add_argument('--iters', type=int, default=4000)
    ap.add_argument('--n-walks', default='32')
    ap.add_argument('--rules', default='round,chained')
    ap.add_argument('--on-block', default='advance')
    ap.add_argument('--seeds', default='0')
    ap.add_argument('--replicas', type=int, default=4)
    ap.add_argument('--max-width', type=float, default=30.0)
    ap.add_argument('--out', default=None)
    args = ap.parse_args()

    walks = [int(x) for x in str(args.n_walks).split(',')]
    rules = args.rules.split(',')
    seeds = [int(x) for x in args.seeds.split(',')]
    for p, rule, seed in itertools.product(walks, rules, seeds):
        res = run_cell(args.m, args.iters, p, rule, args.on_block, seed,
                       args.max_width, args.replicas)
        line = json.dumps(res)
        print(line, flush=True)
        if args.out:
            with open(args.out, 'a') as f:
                f.write(line + '\n')


if __name__ == '__main__':
    main()
