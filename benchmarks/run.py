"""Benchmark driver: the five BASELINE.md configurations.

Usage::

    python -m benchmarks.run [--config NAME] [--n-runs N] [--n-steps K]
                             [--cpu] [--json]

Configs: chain, lattice, regular3, qaoa, sycamore (default: all but
sycamore's full-scale run; sycamore uses fewer replicas).

Reports per config: best log2(flops), SA move evaluations/sec, runtime.
``--cpu`` additionally runs the native multithreaded CPU engine for a
same-workload host baseline (the reference's execution model).
"""

import argparse
import json
import time

import numpy as np


def build_config(name: str, seed: int = 0):
    from benchmarks import networks

    if name == 'chain':
        return networks.chain(4), None
    if name == 'lattice':
        return networks.lattice_2d(8, 8), None
    if name == 'regular3':
        return networks.random_regular(150, 3, 2, seed), None
    if name == 'qaoa':
        return networks.qaoa_tn(26, 4, seed), 30.0  # max_width 2^30
    if name == 'lattice_fw':
        # Tiny width-capped config for driver tests (not a BASELINE.md
        # row): 4x4 lattice under a 2^3 cap exercises the FW protocol
        # end-to-end in seconds on CPU.
        return networks.lattice_2d(4, 4), 3.0
    if name == 'sycamore':
        return networks.sycamore_like_tn(20, seed), None
    if name == 'sycamore_fw':
        # The quantum-advantage workflow proper: the Sycamore-like
        # network under a memory cap (width <= 2^30), tree + slices
        # co-optimized (reference finite_width/sa.py).
        return networks.sycamore_like_tn(20, seed), 30.0
    raise ValueError(f'Unknown config: {name}')


def run_config(name: str, n_runs: int, n_steps: int, beta_max: float,
               cpu: bool, seed: int = 0) -> dict:
    import jax.numpy as jnp

    from tnco_tpu.ctree import ContractionTree
    from tnco_tpu.optimize.finite_width import (
        SimpleCostModel as FWCostModel)
    from tnco_tpu.optimize.infinite_memory import SimpleCostModel
    from tnco_tpu.parallel import ReplicaRunner
    from tnco_tpu.parallel.replicas import ReplicaRunnerFW
    from tnco_tpu.utils.tn import get_random_contraction_path

    (ts_inds, output_inds, dims), max_width = build_config(name, seed)
    order = tuple(dict.fromkeys(x for xs in ts_inds for x in xs))

    t_setup = time.perf_counter()
    n_paths = min(n_runs, 32)
    paths = [
        get_random_contraction_path(ts_inds, output_inds, merge_paths=False,
                                    seed=seed + r) for r in range(n_paths)
    ]
    ctrees = [
        ContractionTree([p for p in paths[r % n_paths] if p][0], ts_inds,
                        dims, output_inds=output_inds,
                        check_shared_inds=True, inds_order=order)
        for r in range(n_runs)
    ]
    t_setup = time.perf_counter() - t_setup

    betas = np.linspace(0.0, beta_max, n_steps, dtype=np.float32)
    seeds = list(range(seed, seed + n_runs))

    if max_width is None:
        runner = ReplicaRunner(ctrees, seeds, cmodel=SimpleCostModel())
    else:
        runner = ReplicaRunnerFW(ctrees, seeds,
                                 cmodel=FWCostModel(max_width=max_width))
    out = runner.run(betas, chunk_size=min(256, n_steps))
    # Force host sync for honest timing
    best = float(np.min(out['log2_min_total']))

    result = {
        'config': name,
        'engine': getattr(runner, 'engine', 'fw-vmapped'),
        'n_tensors': len(ts_inds),
        'n_nodes': len(ctrees[0]),
        'n_inds': ctrees[0].n_inds,
        'n_runs': n_runs,
        'n_steps': n_steps,
        'best_log2_flops': best,
        'initial_log2_flops': float(
            np.log2(float(ctrees[0].total_cost_exact()))
            if ctrees[0].total_cost_exact() > 0 else 0.0),
        'moves': out.get('moves', 0),
        'moves_per_sec': out.get('moves', 0) / out['runtime_s'],
        'runtime_s': out['runtime_s'],
        'setup_s': t_setup,
    }

    if cpu and max_width is None:
        from tnco_tpu import native
        if native.available():
            nodes = np.stack([c.nodes_array.copy() for c in ctrees])
            inds = np.stack([c.inds_array.copy() for c in ctrees])
            t0 = time.perf_counter()
            cpu_best, cpu_moves, _, _ = native.sa_run(
                nodes, inds, ctrees[0].log2_dims_array,
                betas.astype(np.float64),
                np.asarray(seeds, dtype=np.uint64), n_threads=0)
            cpu_dt = time.perf_counter() - t0
            result.update(cpu_best_log2_flops=float(cpu_best.min()),
                          cpu_moves_per_sec=cpu_moves / cpu_dt,
                          cpu_runtime_s=cpu_dt)
    return result


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', default=None,
                        help='chain|lattice|regular3|qaoa|sycamore')
    parser.add_argument('--n-runs', type=int, default=None)
    parser.add_argument('--n-steps', type=int, default=None)
    parser.add_argument('--beta-max', type=float, default=50.0)
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('--json', action='store_true')
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args()

    defaults = {
        'chain': (256, 128),
        'lattice': (1024, 512),
        'regular3': (512, 1024),
        'qaoa': (256, 256),
        'sycamore': (32, 256),
    }
    configs = [args.config] if args.config else list(defaults)

    results = []
    for name in configs:
        n_runs, n_steps = defaults[name]
        n_runs = args.n_runs or n_runs
        n_steps = args.n_steps or n_steps
        res = run_config(name, n_runs, n_steps, args.beta_max, args.cpu,
                         args.seed)
        results.append(res)
        if args.json:
            print(json.dumps(res))
        else:
            extra = ''
            if 'cpu_best_log2_flops' in res:
                extra = (f"  cpu_best={res['cpu_best_log2_flops']:.3f} "
                         f"cpu_rate={res['cpu_moves_per_sec']:.3g}/s")
            print(f"{name:10s} N={res['n_nodes']:5d} "
                  f"best={res['best_log2_flops']:8.3f} "
                  f"(init {res['initial_log2_flops']:8.3f}) "
                  f"rate={res['moves_per_sec']:.3g} moves/s "
                  f"t={res['runtime_s']:.2f}s [{res['engine']}]" + extra)


if __name__ == '__main__':
    main()
