"""Quality protocol, REFERENCE arm: the actual google-research/tnco.

Runs the reference's own C++ SA kernel (built in-image by
``benchmarks.refbaseline``) on the same networks, same wall-clock
budget and the same beta schedule as ``benchmarks.quality``, so
QUALITY.md can carry a true differential baseline instead of this
repo's own C++ reimplementation (VERDICT round 1, item 4).

Replica chains are independent reference Optimizers advanced
round-robin in wall-clock chunks; beta ramps linearly with elapsed
budget fraction exactly like the other two arms (quality.py:61-93).
The host has one CPU core, so chains run sequentially in-process —
the same total core-seconds the native-arm baseline gets.

Usage::

    python -m benchmarks.quality_ref --config lattice --seconds 30
"""

import argparse
import json
import time


def run_reference_arm(name: str, seconds: float, seed: int = 0,
                      n_replicas: int = 32,
                      chunk_sweeps: int = 16,
                      cost_type: str = 'float64',
                      run_seed_offset: int = 0) -> dict:
    """``run_seed_offset`` offsets the per-chain optimizer seeds only
    (the problem instance — the per-replica initial paths — stays that
    of ``seed``), mirroring quality.run_quality's repetition contract
    so reference-arm cells can be repeated for per-seed medians
    (VERDICT r4 missing #1: the ref column must be measured under the
    same repeated-cell protocol as the arms it is compared against)."""
    from benchmarks import refbaseline
    from benchmarks.run import build_config

    tnco = refbaseline.load()
    from tnco.ctree import ContractionTree
    from tnco.optimize.prob import MetropolisHastings
    from tnco.utils.tn import get_random_contraction_path

    (ts_inds, output_inds, dims), max_width = build_config(name, seed)
    ts_inds = [list(xs) for xs in ts_inds]
    beta_max = 60.0

    if max_width is not None:
        from tnco.optimize.finite_width import Optimizer
        from tnco.optimize.finite_width.cost_model import SimpleCostModel
        cmodel = SimpleCostModel(max_width=max_width, cost_type=cost_type)
    else:
        from tnco.optimize.infinite_memory import Optimizer
        from tnco.optimize.infinite_memory.cost_model import SimpleCostModel
        cmodel = SimpleCostModel(cost_type=cost_type)

    # Same path-per-replica recipe as quality.py (first connected
    # component of a seeded random greedy path).
    n_paths = min(n_replicas, 32)
    paths = [
        get_random_contraction_path(ts_inds, output_inds,
                                    merge_paths=False, seed=seed + r)
        for r in range(n_paths)
    ]

    opts = []
    t_setup0 = time.perf_counter()
    for r in range(n_replicas):
        path = [p for p in paths[r % n_paths] if p][0]
        ctree = ContractionTree(path, ts_inds, dims,
                                output_inds=output_inds,
                                check_shared_inds=True)
        opts.append(Optimizer(ctree, cmodel,
                              seed=seed + run_seed_offset + r))
    setup_s = time.perf_counter() - t_setup0

    prob = MetropolisHastings(0.0, cost_type=cost_type)
    sweeps = 0
    is_fw = max_width is not None
    # [cumulative sweeps (x n_replicas implied), best log2 so far] per
    # round-robin pass — the proposal-normalized parity curve's x axis
    # is sweeps * proposals-per-sweep (calibrated off the native arm,
    # same algorithm; see docs/QUALITY.md).
    curve = []
    t0 = time.perf_counter()
    while True:
        frac = (time.perf_counter() - t0) / seconds
        if frac >= 1.0:
            break
        prob.beta = min(frac, 1.0) * beta_max
        for opt in opts:
            for k in range(chunk_sweeps):
                if is_fw:
                    opt.update(prob, update_slices=(sweeps + k) % 10 == 0)
                else:
                    opt.update(prob)
            sweeps += chunk_sweeps
            if (time.perf_counter() - t0) / seconds >= 1.0:
                break
        curve.append([sweeps,
                      float(min(o.log2_min_total_cost for o in opts))])
    ref_time = time.perf_counter() - t0

    best = min(opt.log2_min_total_cost for opt in opts)
    n_leaves = len(ts_inds)
    # One reference sweep = one proposal per internal node on the
    # leaf-to-root walk; the walk length is the leaf's depth.  Report
    # exact proposal counts would need per-sweep depths; approximate
    # with sweeps (the reference itself reports sweeps as `n_steps`).
    return {
        'config': name,
        'arm': 'reference',
        'max_width': max_width,
        'n_leaves': n_leaves,
        'seconds': seconds,
        'seed': seed,
        'ref_replicas': n_replicas,
        'ref_best_log2_flops': float(best),
        'ref_sweeps': sweeps,
        'ref_time_s': ref_time,
        'ref_curve': curve,
        'setup_s': setup_s,
        'cost_type': cost_type,
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', default='lattice')
    parser.add_argument('--seconds', type=float, default=30.0)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--replicas', type=int, default=32)
    parser.add_argument('--cost-type', default='float64')
    parser.add_argument('--run-seed-offset', type=int, default=0)
    args = parser.parse_args()
    res = run_reference_arm(args.config, args.seconds, args.seed,
                            args.replicas, cost_type=args.cost_type,
                            run_seed_offset=args.run_seed_offset)
    print(json.dumps(res, indent=1))


if __name__ == '__main__':
    main()
