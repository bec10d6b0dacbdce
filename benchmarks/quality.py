"""Quality benchmark: best log2(flops) at a fixed wall-clock budget.

Compares the TPU replica-batch engines against the native multithreaded
CPU engine (the reference's execution model: independent mt19937 SA chains
on all cores) on the same network, same time budget.

Usage::

    python -m benchmarks.quality --config lattice --seconds 30
"""

import argparse
import json
import os
import time

import numpy as np


def _enable_cache() -> None:
    """Repo-local persistent compile cache for every benchmark cell
    (VERDICT r4 item 4: fresh-process walk-engine compiles cost minutes;
    the cache makes only the first process pay)."""
    from tnco_tpu.utils import compile_cache
    os.environ.setdefault(
        'TNCO_TPU_COMPILE_CACHE',
        os.path.join(os.path.dirname(os.path.dirname(__file__)) or '.',
                     '.jax_cache'))
    compile_cache.enable()


def run_quality(name: str, seconds: float, seed: int = 0,
                n_tpu_replicas: int | None = None,
                n_cpu_replicas: int = 256,
                exchange_every: int | None = None,
                exchange_islands: int | None = None,
                kick: bool | None = None,
                kick_window: int = 10,
                kick_delta: float = 10.0,
                fw_slicer: str | None = None,
                engine: str = 'auto',
                n_walks: int | None = None,
                walk_chunk: int = 0,
                tpu_beta_max: float | None = None,
                update_slices: int | None = None,
                on_block: str | None = None,
                accept_rule: str | None = None,
                run_seed_offset: int = 0,
                tempering: bool = False) -> dict:
    """``run_seed_offset`` offsets the per-replica PRNG seeds on BOTH
    arms (device threefry keys and CPU mt19937 streams) without
    changing the problem instance (the trees stay those of ``seed``) —
    independent repetitions of a cell for median/min reporting."""
    import jax.numpy as jnp

    from benchmarks.run import build_config
    from tnco_tpu import native
    from tnco_tpu.ctree import ContractionTree
    from tnco_tpu.optimize.infinite_memory import SimpleCostModel
    from tnco_tpu.parallel import ReplicaRunner
    from tnco_tpu.utils.tn import get_random_contraction_path

    (ts_inds, output_inds, dims), max_width = build_config(name, seed)
    if max_width is not None:
        return _run_quality_fw(name, ts_inds, output_inds, dims, max_width,
                               seconds, seed, n_tpu_replicas,
                               n_cpu_replicas, engine, n_walks, walk_chunk,
                               exchange_every=exchange_every,
                               exchange_islands=exchange_islands,
                               kick=kick, kick_window=kick_window,
                               kick_delta=kick_delta,
                               fw_slicer=fw_slicer,
                               tpu_beta_max=tpu_beta_max,
                               update_slices=update_slices,
                               on_block=on_block,
                               accept_rule=accept_rule,
                               run_seed_offset=run_seed_offset,
                               tempering=tempering)
    order = tuple(dict.fromkeys(x for xs in ts_inds for x in xs))

    n_paths = 32
    paths = [
        get_random_contraction_path(ts_inds, output_inds,
                                    merge_paths=False, seed=seed + r)
        for r in range(n_paths)
    ]

    def tree(r):
        return ContractionTree([p for p in paths[r % n_paths] if p][0],
                               ts_inds, dims, output_inds=output_inds,
                               check_shared_inds=True, inds_order=order)

    template = tree(0)
    n_nodes = len(template)

    # Both engines anneal beta linearly with *elapsed wall-clock fraction*
    # so the schedule completes within the budget regardless of engine
    # speed (the quality driver, not a fixed sweep count).  The CPU arm
    # always uses the totals-rule scale (60); the TPU arm's scale is set
    # after the runner resolves prob_kind ('mh_local' deltas are
    # per-pair bits — ~50x the totals-rule magnitudes).
    beta_max = 60.0

    # --- TPU: replica batch, chunked until the budget expires -------------
    # Large-net default B=16: the defended walker operating point
    # (docs/QUALITY.md round-2 device arms).  ``n_tpu_replicas=0`` skips
    # the device arm entirely (CPU/reference-only matrix cells).
    if n_tpu_replicas is None:
        n_tpu_replicas = 1024 if n_nodes * \
            template.inds_array.shape[1] <= 32768 else 16
    tpu_engine = None
    tpu_best = None
    tpu_moves = 0
    tpu_applied = None
    tpu_time = 0.0
    tpu_curve = []  # [cumulative proposals, best log2 so far] per chunk
    tpu_setup = None
    ladder = None
    if n_tpu_replicas:
        setup_t0 = time.perf_counter()
        ctrees = [tree(r) for r in range(n_tpu_replicas)]
        run_ids = [run_seed_offset + r for r in range(n_tpu_replicas)]
        runner = ReplicaRunner(ctrees, run_ids,
                               cmodel=SimpleCostModel(), engine=engine,
                               n_walks=n_walks, walk_chunk=walk_chunk,
                               on_block=on_block,
                               accept_rule=accept_rule)
        tpu_engine = runner.engine
        if exchange_every is None:
            # Defended cadence (docs/QUALITY.md: the 300 s flagship wins
            # use exchange every 4 chunks); device engines only.
            from tnco_tpu.parallel.replicas import _LANE_MAJOR
            exchange_every = 4 if runner.engine in _LANE_MAJOR else 0
        if tpu_beta_max is None:
            tpu_beta_max = (3000.0 if runner.cfg.prob_kind == 'mh_local'
                            else beta_max)
        # Walk-family engines do one proposal per walk per beta — long
        # chunks amortize the per-call tunnel RPC without skewing the
        # elapsed-fraction beta schedule (the window is time-based).
        chunk_sweeps = 256 if runner.engine in ('multiwalk', 'walker',
                                                'walks') else 128
        if tempering:
            from tnco_tpu.parallel.tempering import TemperingLadder
            if runner.states is None:
                raise ValueError('--tempering needs a device engine')
            ladder = TemperingLadder(n_tpu_replicas,
                                     beta_max=tpu_beta_max, seed=seed)

        # Warm-up compile outside the budget (not counted in tpu_moves).
        # ``tpu_setup_s`` reports this tree-build + compile + upload time
        # so cells state the user-experience cost, not just the budget.
        runner.run(np.zeros(chunk_sweeps, dtype=np.float32),
                   chunk_size=chunk_sweeps)
        runner.moves_done = 0
        runner.applied_done = None
        tpu_setup = time.perf_counter() - setup_t0
        t0 = time.perf_counter()
        n_calls = 0
        while True:
            frac0 = (time.perf_counter() - t0) / seconds
            if frac0 >= 1.0:
                break
            if ladder is not None:
                betas = ladder.betas_for(chunk_sweeps)
            else:
                # Estimated fraction covered by this chunk: assume it
                # takes as long as the average so far (coarse,
                # self-correcting).
                betas = np.linspace(min(frac0, 1.0) * tpu_beta_max,
                                    min(frac0 + 0.05, 1.0) * tpu_beta_max,
                                    chunk_sweeps).astype(np.float32)
            runner.run(betas, chunk_size=chunk_sweeps)
            n_calls += 1
            if ladder is not None:
                ladder.swap(np.asarray(runner.states.log2_total))
            # Each run call is a single device chunk, so in-run exchange
            # cadences never fire; exchange between calls instead.
            if (exchange_every and runner.states is not None and
                    n_calls % exchange_every == 0):
                from tnco_tpu.parallel.replicas import (_LANE_MAJOR,
                                                        exchange_best)
                if runner.engine in _LANE_MAJOR:
                    runner.states = exchange_best(runner.states)
            tpu_curve.append([int(runner.moves_done),
                              float(np.min(runner.log2_min_totals()))])
        tpu_time = time.perf_counter() - t0
        tpu_best = float(np.min(runner.log2_min_totals()))
        tpu_moves = runner.moves_done
        tpu_applied = runner.applied_done

    # --- CPU: native engine on all cores, chunked similarly ---------------
    cpu_best = None
    cpu_moves = 0
    cpu_time = 0.0
    cpu_curve = []
    if native.available() and n_cpu_replicas > 0:
        nodes = np.stack(
            [tree(r).nodes_array.copy() for r in range(n_cpu_replicas)])
        inds = np.stack(
            [tree(r).inds_array.copy() for r in range(n_cpu_replicas)])
        base_seeds = (np.arange(n_cpu_replicas, dtype=np.uint64)
                      + np.uint64(run_seed_offset))
        chunk_sweeps_cpu = 64
        bests = np.full(n_cpu_replicas, np.inf)
        chunk_idx = 0
        t0 = time.perf_counter()
        while True:
            frac0 = (time.perf_counter() - t0) / seconds
            if frac0 >= 1.0:
                break
            betas_chunk = np.linspace(min(frac0, 1.0) * beta_max,
                                      min(frac0 + 0.05, 1.0) * beta_max,
                                      chunk_sweeps_cpu)
            # Fresh per-chunk seed offsets + final-tree resume: reusing
            # the same seeds replays identical mt19937 streams every
            # chunk, and the default in-place result is the BEST tree —
            # both silently cripple the annealing across chunk
            # boundaries (found by a controlled reference comparison).
            seeds = base_seeds + np.uint64(chunk_idx * n_cpu_replicas)
            chunk_idx += 1
            best, moves, nodes, inds, _, _ = native.sa_run(
                nodes, inds, template.log2_dims_array, betas_chunk, seeds,
                n_threads=0, return_final=True)
            bests = np.minimum(bests, best)
            cpu_moves += moves
            cpu_curve.append([int(cpu_moves), float(bests.min())])
        cpu_time = time.perf_counter() - t0
        cpu_best = float(bests.min())

    return {
        'config': name,
        'n_nodes': n_nodes,
        'seconds': seconds,
        'tpu_engine': tpu_engine,
        'tpu_replicas': n_tpu_replicas,
        'tpu_best_log2_flops': tpu_best,
        'tpu_moves': tpu_moves,
        'tpu_applied': tpu_applied,
        'tpu_time_s': tpu_time,
        'tpu_setup_s': tpu_setup,
        'tpu_curve': tpu_curve,
        'tempering_swap_rate': (None if ladder is None else
                                ladder.swap_rate),
        'cpu_replicas': n_cpu_replicas,
        'cpu_best_log2_flops': cpu_best,
        'cpu_moves': cpu_moves,
        'cpu_time_s': cpu_time,
        'cpu_curve': cpu_curve,
    }


def _run_quality_fw(name, ts_inds, output_inds, dims, max_width,
                    seconds, seed, n_tpu_replicas, n_cpu_replicas,
                    engine: str = 'auto', n_walks: int | None = None,
                    walk_chunk: int = 0,
                    exchange_every: int | None = None,
                    exchange_islands: int | None = None,
                    kick: bool | None = None,
                    kick_window: int = 10,
                    kick_delta: float = 10.0,
                    fw_slicer: str | None = None,
                    tpu_beta_max: float | None = None,
                    update_slices: int | None = None,
                    on_block: str | None = None,
                    accept_rule: str | None = None,
                    run_seed_offset: int = 0,
                    tempering: bool = False) -> dict:
    """Finite-width protocol: width-capped SA + slices, same budget rule."""
    import jax.numpy as jnp

    from tnco_tpu import native
    from tnco_tpu.ctree import ContractionTree
    from tnco_tpu.kernels import sa_finite as saf
    from tnco_tpu.optimize.finite_width import SimpleCostModel
    from tnco_tpu.parallel.replicas import ReplicaRunnerFW
    from tnco_tpu.utils.tn import get_random_contraction_path

    order = tuple(dict.fromkeys(x for xs in ts_inds for x in xs))
    n_paths = 32
    paths = [
        get_random_contraction_path(ts_inds, output_inds,
                                    merge_paths=False, seed=seed + r)
        for r in range(n_paths)
    ]

    def tree(r):
        return ContractionTree([p for p in paths[r % n_paths] if p][0],
                               ts_inds, dims, output_inds=output_inds,
                               check_shared_inds=True, inds_order=order)

    template = tree(0)
    n_nodes = len(template)
    beta_max = 60.0
    cmodel = SimpleCostModel(max_width=max_width)

    # Large-net default B=64: the defended walks operating point
    # (docs/QUALITY.md round-2 device arms: B=64/P=32/update_slices=2).
    # ``n_tpu_replicas=0`` skips the device arm (CPU/reference-only
    # matrix cells).
    if n_tpu_replicas is None:
        n_tpu_replicas = 256 if n_nodes * \
            template.inds_array.shape[1] <= 32768 else 64
    tpu_engine = None
    tpu_best = None
    tpu_moves = 0
    tpu_applied = None
    tpu_time = 0.0
    tpu_curve = []
    tpu_setup = None
    ladder = None
    kicker = None
    tpu_diag = []
    if n_tpu_replicas:
        setup_t0 = time.perf_counter()
        ctrees = [tree(r) for r in range(n_tpu_replicas)]
        run_ids = [run_seed_offset + r for r in range(n_tpu_replicas)]
        runner = ReplicaRunnerFW(ctrees, run_ids,
                                 cmodel=cmodel, engine=engine,
                                 n_walks=n_walks, walk_chunk=walk_chunk,
                                 on_block=on_block,
                                 accept_rule=accept_rule,
                                 fw_slicer=fw_slicer)
        from tnco_tpu.parallel.replicas import _LANE_MAJOR
        tpu_engine = runner.engine
        if exchange_every is None:
            exchange_every = 4 if runner.engine in _LANE_MAJOR else 0
        # Round-5 product defaults on the FW walk-family path: island
        # exchange (B//16 islands) + the stall kicker — the fix for the
        # whole-population collapse mode (docs/QUALITY.md round-5).
        walk_family = runner.engine in ('multiwalk', 'walker', 'walks')
        if exchange_islands is None:
            exchange_islands = (max(1, n_tpu_replicas // 16)
                                if walk_family else 1)
        if kick is None:
            kick = walk_family and runner.states is not None
        if update_slices is None:
            # Walk-family engines count the cadence in iterations (the
            # defended point is 2); sweep-count engines keep the
            # reference's per-sweep cadence of 10.
            update_slices = 2 if runner.engine in ('multiwalk', 'walker',
                                                   'walks') else 10
        if tpu_beta_max is None:
            tpu_beta_max = (3000.0 if runner.cfg.prob_kind == 'mh_local'
                            else beta_max)
        chunk_sweeps = 256 if runner.engine in ('multiwalk', 'walker',
                                                'walks') else 64
        if tempering:
            from tnco_tpu.parallel.tempering import TemperingLadder
            ladder = TemperingLadder(n_tpu_replicas,
                                     beta_max=tpu_beta_max, seed=seed)
        # Warm-up compile outside the budget; ``tpu_setup_s`` reports it.
        runner.run(np.zeros(chunk_sweeps, dtype=np.float32),
                   chunk_size=chunk_sweeps, update_slices=update_slices)
        if kick and exchange_islands >= 1 and \
                n_tpu_replicas % exchange_islands == 0:
            from tnco_tpu.parallel.stall import IslandStallKicker
            kicker = IslandStallKicker(runner, exchange_islands,
                                       window_chunks=kick_window,
                                       min_delta=kick_delta,
                                       seed=seed + run_seed_offset)
        # Warm the exchange/kick op sets outside the budget too: over a
        # tunneled backend every new eager op shape pays a one-time
        # compile (measured 18 s for the first island exchange and 30 s
        # for the first kick at Sycamore shapes — 16% of a 300 s budget
        # if paid in-run).  State mutation here is harmless: the
        # warm-up run above already advances the beta-0 random state,
        # and a kick only redraws width-valid slices on one lane.
        if (exchange_every and runner.states is not None and
                runner.engine in _LANE_MAJOR and exchange_islands >= 1
                and n_tpu_replicas % exchange_islands == 0):
            from tnco_tpu.parallel.replicas import exchange_best_fw
            runner.states = exchange_best_fw(
                runner.states, islands=exchange_islands,
                active=(None if kicker is None else
                        kicker.exchange_active(0)))
        if kicker is not None:
            # The device-slicer kick compiles at a FIXED [N, W, B]
            # shape, so one warm call covers every in-run kick
            # regardless of victim count; still use the kicker's real
            # victims so the column-write op shapes are warmed too.
            from tnco_tpu.parallel.replicas import kick_lanes_fw
            bg = n_tpu_replicas // exchange_islands
            victims = list(range(kicker.keep_top, bg))
            kick_lanes_fw(runner, victims, 0,
                          seed=seed + run_seed_offset)
            np.asarray(runner.states.log2_total)  # flush dispatches
        runner.moves_done = 0
        runner.applied_done = None
        tpu_setup = time.perf_counter() - setup_t0
        prev_slices = None
        t0 = time.perf_counter()
        n_calls = 0
        while True:
            frac0 = (time.perf_counter() - t0) / seconds
            if frac0 >= 1.0:
                break
            if ladder is not None:
                betas = ladder.betas_for(chunk_sweeps)
            else:
                betas = np.linspace(min(frac0, 1.0) * tpu_beta_max,
                                    min(frac0 + 0.05, 1.0) * tpu_beta_max,
                                    chunk_sweeps).astype(np.float32)
            runner.run(betas, chunk_size=chunk_sweeps,
                       update_slices=update_slices)
            n_calls += 1
            if ladder is not None:
                ladder.swap(np.asarray(runner.states.log2_total))
            # ONE device pull per chunk, shared by the curve, the stall
            # watchdog and the island diagnostics (pulls ride the
            # tunnel; keeping the per-chunk RPC count at the round-4
            # level keeps cells comparable across rounds).
            mins = np.asarray(runner.log2_min_totals())
            if kicker is not None:
                kicker.observe(n_calls, frac0, mins=mins)
            # See the IM arm: in-run exchange cadences never fire with
            # single-chunk calls, so exchange between calls.
            if (exchange_every and runner.states is not None and
                    n_calls % exchange_every == 0):
                from tnco_tpu.parallel.replicas import exchange_best_fw
                if runner.engine in _LANE_MAJOR:
                    runner.states = exchange_best_fw(
                        runner.states, islands=exchange_islands,
                        active=(None if kicker is None else
                                kicker.exchange_active(n_calls)))
            tpu_curve.append([int(runner.moves_done),
                              float(mins.min())])
            # Round-5 stuck-mode instrumentation: per-island
            # best-so-far every chunk (free — reuses ``mins``);
            # current-total spread and slice churn every 8th chunk
            # (each an extra tunnel pull).
            if runner.states is not None and exchange_islands >= 1 and \
                    n_tpu_replicas % exchange_islands == 0:
                im = mins.reshape(exchange_islands, -1).min(axis=1)
                entry = {
                    't': round(time.perf_counter() - t0, 2),
                    'im': [round(float(x), 3) for x in im],
                    'ap': int(runner.applied_done or 0),
                    'kk': 0 if kicker is None else len(kicker.kicks),
                }
                if n_calls % 8 == 1:
                    lt_cur = np.asarray(runner.states.log2_total)
                    sl = np.asarray(runner.states.slices)
                    entry['lq'] = [round(float(lt_cur.min()), 3),
                                   round(float(np.median(lt_cur)), 3)]
                    entry['sc'] = (
                        int(np.bitwise_count(sl ^ prev_slices).sum())
                        if prev_slices is not None else 0)
                    prev_slices = sl
                tpu_diag.append(entry)
        tpu_time = time.perf_counter() - t0
        tpu_best = float(np.min(runner.log2_min_totals()))
        tpu_moves = runner.moves_done
        tpu_applied = runner.applied_done

    cpu_best = None
    cpu_moves = 0
    cpu_time = 0.0
    cpu_curve = []
    if native.available() and n_cpu_replicas > 0:
        from random import Random

        slices0 = [
            saf.greedy_slices_host(tree(r).inds_array,
                                   template.log2_dims_array,
                                   float(max_width), Random(seed + r))
            for r in range(n_cpu_replicas)
        ]
        nodes = np.stack(
            [tree(r).nodes_array.copy() for r in range(n_cpu_replicas)])
        inds = np.stack(
            [tree(r).inds_array.copy() for r in range(n_cpu_replicas)])
        slices = np.stack(slices0)
        skip = np.zeros(template.inds_array.shape[1], dtype=np.uint32)
        base_seeds = (np.arange(n_cpu_replicas, dtype=np.uint64)
                      + np.uint64(run_seed_offset))
        chunk_cpu = 64
        bests = np.full(n_cpu_replicas, np.inf)
        chunk_idx = 0
        t0 = time.perf_counter()
        while True:
            frac0 = (time.perf_counter() - t0) / seconds
            if frac0 >= 1.0:
                break
            betas_chunk = np.linspace(min(frac0, 1.0) * beta_max,
                                      min(frac0 + 0.05, 1.0) * beta_max,
                                      chunk_cpu)
            # Same chunk-boundary discipline as the IM arm (fresh seed
            # offsets, resume from the FINAL tree, not the best one).
            seeds = base_seeds + np.uint64(chunk_idx * n_cpu_replicas)
            chunk_idx += 1
            best, moves, nodes, inds, slices, _, _, _ = native.sa_run_fw(
                nodes, inds, slices, template.log2_dims_array, skip,
                float(max_width), betas_chunk, seeds, reslice_every=10,
                n_threads=0, return_final=True)
            bests = np.minimum(bests, best)
            cpu_moves += moves
            cpu_curve.append([int(cpu_moves), float(bests.min())])
        cpu_time = time.perf_counter() - t0
        cpu_best = float(bests.min())

    return {
        'config': name,
        'max_width': max_width,
        'n_nodes': n_nodes,
        'seconds': seconds,
        'tpu_engine': tpu_engine,
        'tpu_replicas': n_tpu_replicas,
        'tpu_best_log2_flops': tpu_best,
        'tpu_moves': tpu_moves,
        'tpu_applied': tpu_applied,
        'tpu_time_s': tpu_time,
        'tpu_setup_s': tpu_setup,
        'tpu_curve': tpu_curve,
        'tpu_islands': (exchange_islands if n_tpu_replicas else None),
        'tpu_kick_params': (None if kicker is None else
                            {'window': kick_window, 'delta': kick_delta}),
        'tpu_kicks': (None if not n_tpu_replicas or kicker is None
                      else kicker.kicks),
        'tpu_diag': (tpu_diag if n_tpu_replicas else None),
        'tempering_swap_rate': (None if ladder is None else
                                ladder.swap_rate),
        'cpu_replicas': n_cpu_replicas,
        'cpu_best_log2_flops': cpu_best,
        'cpu_moves': cpu_moves,
        'cpu_time_s': cpu_time,
        'cpu_curve': cpu_curve,
    }


def main() -> None:
    # Mirror the CLI's platform override (sitecustomize pins
    # JAX_PLATFORMS=axon; the env var alone may not stick).
    platform = os.environ.get('TNCO_TPU_PLATFORM')
    if platform:
        import jax
        jax.config.update('jax_platforms', platform)
    _enable_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', default='lattice')
    parser.add_argument('--seconds', type=float, default=30.0)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--tpu-replicas', type=int, default=None,
                        help='0 skips the device arm entirely.')
    parser.add_argument('--cpu-replicas', type=int, default=256,
                        help='0 skips the CPU arm entirely.')
    parser.add_argument('--exchange-every', type=int, default=None,
                        help='Population exchange every N chunks (0 = '
                             'independent runs; default: 4 on device '
                             'engines — the defended flagship cadence '
                             '— else 0).')
    parser.add_argument('--exchange-islands', type=int, default=None,
                        help='Exchange topology: N independent islands '
                             '(FW walk engines default to B//16 — the '
                             'round-5 collapse fix; 1 = whole '
                             'population).')
    parser.add_argument('--kick', dest='kick', default=None,
                        action='store_true',
                        help='Island stall kicker (FW walk engines: '
                             'default on; --no-kick disables).')
    parser.add_argument('--no-kick', dest='kick', action='store_false')
    parser.add_argument('--kick-window', type=int, default=10,
                        help='Stall window in chunks before a kick.')
    parser.add_argument('--kick-delta', type=float, default=10.0,
                        help='Minimum bits of island improvement that '
                             'resets the stall window.  The defaults '
                             '(10 chunks / 10 bits, cooldown 60) make '
                             'the kick a PERIODIC re-diversification — '
                             'the round-5 A/B winner: same medians as '
                             'stall-triggered kicking with the 6-rep '
                             'worst at 63.73 vs 65.54 (docs/QUALITY.md).')
    parser.add_argument('--engine', default='auto',
                        help="'auto' | 'batched' | 'vmapped' | 'native' "
                             "| 'multiwalk' | 'walker' | 'sweep' "
                             "| 'walks'.")
    parser.add_argument('--n-walks', type=int, default=None,
                        help='Concurrent walks per replica (multiwalk, '
                             'walker and walks engines; default: '
                             'the per-engine defended operating point).')
    parser.add_argument('--walk-chunk', type=int, default=0,
                        help='Walk group size (multiwalk engine; '
                             '0 = all at once).')
    parser.add_argument('--tpu-beta-max', type=float, default=None,
                        help='Override the TPU-arm beta_max (default: '
                             '60, or 3000 under mh_local).')
    parser.add_argument('--tempering', action='store_true',
                        help='TPU arm: parallel-tempering ladder '
                             'instead of the annealed schedule.')
    parser.add_argument('--update-slices', type=int, default=None,
                        help='TPU-arm reslice cadence in sweeps/'
                             'iterations (FW configs; default: 2 on '
                             'walk-family engines, else 10).')
    parser.add_argument('--on-block', default=None,
                        help="Walk scheduling on conflict discard "
                             "('advance' | 'restart' | 'dedup'; "
                             "multiwalk/walks engines).")
    parser.add_argument('--fw-slicer', default=None,
                        help="walks-FW reslice path: 'plane' "
                             "(incremental union planes) | 'ref' "
                             "(reference-shaped slow path, no union "
                             "planes in the state) | default auto.")
    parser.add_argument('--accept-rule', default=None,
                        help="Walk-engine acceptance rule ('round' | "
                             "'chained'; chained tests each walk "
                             "against the running total).")
    parser.add_argument('--run-seed-offset', type=int, default=0,
                        help='Offset the per-replica PRNG seeds on both '
                             'arms (independent repetition of a cell; '
                             'the problem instance is unchanged).')
    args = parser.parse_args()
    res = run_quality(args.config, args.seconds, args.seed,
                      args.tpu_replicas, args.cpu_replicas,
                      exchange_every=args.exchange_every,
                      exchange_islands=args.exchange_islands,
                      kick=args.kick, kick_window=args.kick_window,
                      kick_delta=args.kick_delta,
                      fw_slicer=args.fw_slicer,
                      engine=args.engine, n_walks=args.n_walks,
                      walk_chunk=args.walk_chunk,
                      tpu_beta_max=args.tpu_beta_max,
                      update_slices=args.update_slices,
                      on_block=args.on_block,
                      accept_rule=args.accept_rule,
                      run_seed_offset=args.run_seed_offset,
                      tempering=args.tempering)
    print(json.dumps(res, indent=1))


if __name__ == '__main__':
    main()
