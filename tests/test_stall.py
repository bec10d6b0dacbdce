"""Island exchange topology + stall kicker (round-5 FW collapse fix).

The mechanisms live OUTSIDE the kernels (between annealing chunks), so
the cross-engine bit-identity invariants are unaffected; these tests
pin the column-mixing contracts instead: island isolation, the active
mask, kick source/victim semantics, min-snapshot preservation, and the
watchdog's window/cooldown/guard behavior.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from tnco_tpu.bitset import Bitset
from tnco_tpu.ctree import ContractionTree
from tnco_tpu.optimize.finite_width import SimpleCostModel as FWModel
from tnco_tpu.parallel.replicas import (ReplicaRunnerFW, exchange_best,
                                        exchange_best_fw, kick_lanes_fw)
from tnco_tpu.parallel.stall import IslandStallKicker
from tnco_tpu.testing.utils import (generate_random_tensors,
                                    is_valid_contraction_tree)
from tnco_tpu.utils.tn import get_random_contraction_path


def _fw_runner(rng, random_seed, n_replicas=8, engine='walks', **kw):
    ts_inds, output_inds, dims = generate_random_tensors(
        rng, n_tensors=10, n_hyper_edges=1, n_output_inds=1)
    order = tuple(dict.fromkeys(x for xs in ts_inds for x in xs))
    ctrees = []
    for r in range(n_replicas):
        paths = get_random_contraction_path(ts_inds, output_inds,
                                            merge_paths=False,
                                            seed=random_seed + r)
        (path,) = [p for p in paths if p]
        ctrees.append(
            ContractionTree(path, ts_inds, dims, output_inds=output_inds,
                            check_shared_inds=True, inds_order=order))
    runner = ReplicaRunnerFW(ctrees, list(range(n_replicas)),
                             cmodel=FWModel(max_width=3.0),
                             engine=engine, **kw)
    return runner, (ts_inds, output_inds, dims, order)


def _leaves(states):
    return {k: np.asarray(getattr(states, k)) for k in states.__slots__}


def test_exchange_islands_isolation(rng, random_seed):
    """With islands=2, island 1's worst lanes restart from ISLAND 1's
    best — never from the global best sitting in island 0."""
    runner, _ = _fw_runner(rng, random_seed, n_replicas=8,
                           engine='batched')
    s = runner.states
    # Pin the ranking: lane 0 global best; island 1's best is lane 5.
    lt = np.array([10.0, 50, 51, 52, 60, 20.0, 61, 62], np.float32)
    s = type(s)(s.c0, s.c1, s.par, s.inds, s.hyper, s.lcc, s.width,
                s.slices, jnp.asarray(lt), s.min_log2_total, s.min_c0,
                s.min_c1, s.min_par, s.min_inds, s.min_slices, s.keys)
    before = np.asarray(s.c0)
    out = exchange_best_fw(s, fraction=0.5, islands=2)
    after = np.asarray(out.c0)
    lt_out = np.asarray(out.log2_total)
    # Island-1 lanes that restarted must carry lane 5's tree and cost.
    restarted = [i for i in range(4, 8) if lt_out[i] == 20.0 and i != 5]
    assert restarted
    for i in restarted:
        np.testing.assert_array_equal(after[:, i], before[:, 5])
    # No island-0 column ever equals an island-1 source or vice versa
    # (lane 0's tree stays out of island 1).
    assert not any(np.array_equal(after[:, i], before[:, 0])
                   for i in restarted
                   if not np.array_equal(before[:, 5], before[:, 0]))
    # Island 0's worst lanes restarted from lane 0.
    restarted0 = [i for i in range(4) if lt_out[i] == 10.0 and i != 0]
    assert restarted0
    for i in restarted0:
        np.testing.assert_array_equal(after[:, i], before[:, 0])
    # Min snapshots untouched.
    np.testing.assert_array_equal(np.asarray(out.min_log2_total),
                                  np.asarray(s.min_log2_total))


def test_exchange_islands_active_mask(rng, random_seed):
    """active=[True, False] leaves the gated island bitwise unchanged."""
    runner, _ = _fw_runner(rng, random_seed, n_replicas=8,
                           engine='batched')
    s = runner.states
    lt = np.array([10.0, 50, 51, 52, 20.0, 60, 61, 62], np.float32)
    s = type(s)(s.c0, s.c1, s.par, s.inds, s.hyper, s.lcc, s.width,
                s.slices, jnp.asarray(lt), s.min_log2_total, s.min_c0,
                s.min_c1, s.min_par, s.min_inds, s.min_slices, s.keys)
    out = exchange_best_fw(s, fraction=0.5, islands=2,
                           active=np.array([True, False]))
    for name in s.__slots__:
        a = np.asarray(getattr(s, name))
        b = np.asarray(getattr(out, name))
        if name == 'keys':
            np.testing.assert_array_equal(a, b)
            continue
        np.testing.assert_array_equal(a[..., 4:], b[..., 4:],
                                      err_msg=f'{name} island 1 changed')
    # ...while island 0 did exchange.
    assert (np.asarray(out.log2_total)[:4] == 10.0).sum() >= 2

    # islands must divide the replica count.
    with pytest.raises(ValueError):
        exchange_best_fw(s, islands=3)


def test_exchange_islands_im_batch(rng, random_seed):
    """IM variant: same per-island contract on SABatch states."""
    from tnco_tpu.optimize.infinite_memory import SimpleCostModel
    from tnco_tpu.parallel.replicas import ReplicaRunner

    ts_inds, output_inds, dims = generate_random_tensors(
        rng, n_tensors=8, n_output_inds=1)
    order = tuple(dict.fromkeys(x for xs in ts_inds for x in xs))
    ctrees = []
    for r in range(8):
        paths = get_random_contraction_path(ts_inds, output_inds,
                                            merge_paths=False,
                                            seed=random_seed + r)
        (path,) = [p for p in paths if p]
        ctrees.append(
            ContractionTree(path, ts_inds, dims, output_inds=output_inds,
                            check_shared_inds=True, inds_order=order))
    runner = ReplicaRunner(ctrees, list(range(8)),
                           cmodel=SimpleCostModel(), engine='batched')
    s = runner.states
    lt = np.array([10.0, 50, 51, 52, 20.0, 60, 61, 62], np.float32)
    s = type(s)(s.c0, s.c1, s.par, s.inds, s.hyper, s.lcc,
                jnp.asarray(lt), s.min_log2_total, s.min_c0, s.min_c1,
                s.min_par, s.min_inds, s.keys)
    before = np.asarray(s.c0)
    out = exchange_best(s, fraction=0.5, islands=2)
    lt_out = np.asarray(out.log2_total)
    restarted = [i for i in range(4, 8) if lt_out[i] == 20.0 and i != 4]
    assert restarted
    for i in restarted:
        np.testing.assert_array_equal(np.asarray(out.c0)[:, i],
                                      before[:, 4])


@pytest.mark.parametrize('slicer', ['device', 'host'])
def test_kick_lanes_fw(rng, random_seed, slicer):
    """Kick contract: victims carry the source tree + fresh valid
    slices + fresh keys; others (and all min snapshots) are bitwise
    untouched; walk positions restart.  Both slicer paths (the
    fixed-shape device slicer and the per-victim host slicer) honor
    the same contract — including the exact-cost audit of the written
    totals against the actually-written slice sets."""
    runner, (ts_inds, output_inds, dims, order) = _fw_runner(
        rng, random_seed, n_replicas=8, engine='walks', n_walks=4)
    betas = np.linspace(0, 8, 20).astype(np.float32)
    runner.run(betas, chunk_size=10, update_slices=5)

    before = _leaves(runner.states)
    pos_before = np.asarray(runner._mw_pos)
    victims, src = [2, 3, 6], 1
    kick_lanes_fw(runner, victims, src, seed=7, slicer=slicer)
    after = _leaves(runner.states)

    untouched = [i for i in range(8) if i not in victims]
    for name in after:
        sel = (np.s_[untouched] if name == 'keys'
               else np.s_[..., untouched])
        np.testing.assert_array_equal(before[name][sel],
                                      after[name][sel],
                                      err_msg=f'{name} non-victim')
    for name in ('min_c0', 'min_c1', 'min_par', 'min_inds',
                 'min_slices', 'min_log2_total'):
        np.testing.assert_array_equal(before[name], after[name])

    for v in victims:
        for name in ('c0', 'c1', 'par', 'inds', 'hyper', 'width'):
            np.testing.assert_array_equal(after[name][..., v],
                                          before[name][..., src],
                                          err_msg=f'{name} victim {v}')
        assert not np.array_equal(after['keys'][v], before['keys'][v])
        # Exact product-oracle audit of the host-rebuilt slice costs:
        # log2_total matches the exact Decimal cost of (tree, slices).
        tree = runner.ctree(v)
        is_valid_contraction_tree(tree, ts_inds, output_inds, dims)
        lanes = np.asarray(runner.states.slices[..., v])
        labels = frozenset(
            order[p] for p in
            Bitset.from_lanes(lanes, len(order)).positions())
        cmodel = FWModel(max_width=3.0)
        exact = sum(
            cmodel.contraction_cost(tree.inds[n.children[0]],
                                    tree.inds[n.children[1]],
                                    tree.inds[p], tree.dims, labels)
            for p, n in enumerate(tree.nodes) if not n.is_leaf())
        got = float(np.asarray(runner.states.log2_total)[v])
        assert got == pytest.approx(math.log2(exact), abs=1e-3)
    # (On tiny nets the greedy slicer is effectively deterministic, so
    # victim slice sets may coincide; the per-lane jitter contract is
    # covered by the distinct fresh keys asserted above.)
    assert (np.asarray(runner._mw_pos)[:, victims] == -1).all()
    np.testing.assert_array_equal(
        np.asarray(runner._mw_pos)[:, untouched],
        pos_before[:, untouched])

    # The engine accepts the kicked state: another chunk stays valid.
    runner.run(betas, chunk_size=10, update_slices=5)
    lm = runner.log2_min_totals()
    idx = int(np.argmin(lm))
    assert runner.min_ctree(idx).is_valid(check_shared_inds=True)


def test_island_stall_kicker(rng, random_seed):
    """Watchdog behavior: fires after the window, respects cooldown and
    the budget-fraction guard, suspends exchange, preserves mins."""
    runner, _ = _fw_runner(rng, random_seed, n_replicas=8,
                           engine='walks', n_walks=4)
    runner.run(np.linspace(0, 4, 10).astype(np.float32), chunk_size=10,
               update_slices=5)
    mins0 = np.asarray(runner.log2_min_totals()).copy()

    kicker = IslandStallKicker(runner, islands=2, window_chunks=2,
                               min_delta=1e9, cooldown_chunks=4,
                               keep_top=1, exchange_skip_chunks=3,
                               frac_guard=0.9, seed=3)
    assert kicker.observe(1, 0.1) == []          # baseline mark
    assert kicker.observe(2, 0.1) == []          # window not yet hit
    assert kicker.observe(3, 0.1) == [0, 1]      # both islands stalled
    assert kicker.observe(4, 0.1) == []          # cooldown
    assert not kicker.exchange_active(4).any()   # exchange suspended
    assert kicker.exchange_active(6).all()
    assert kicker.observe(8, 0.95) == []         # frac guard
    assert kicker.observe(8, 0.1) == [0, 1]      # re-armed
    assert len(kicker.kicks) == 4
    # Kicks never regress the reported best.
    np.testing.assert_array_equal(
        np.asarray(runner.log2_min_totals()), mins0)


def test_quality_driver_smoke_islands(rng, random_seed):
    """The FW quality driver end-to-end with islands + kicker on CPU
    (tiny budget): runs, reports diag/kick fields."""
    from benchmarks.quality import run_quality

    res = run_quality('lattice_fw', 2.0, seed=0, n_tpu_replicas=8,
                      n_cpu_replicas=0, engine='walks', n_walks=4,
                      exchange_islands=2, kick=True, kick_window=2,
                      kick_delta=1e9)
    assert res['tpu_islands'] == 2
    assert res['tpu_diag'] and 'im' in res['tpu_diag'][0]
    assert isinstance(res['tpu_kicks'], list)
    assert np.isfinite(res['tpu_best_log2_flops'])
