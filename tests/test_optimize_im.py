"""Infinite-memory Optimizer wrapper tests (parity with reference
tests/test_utils.py:578-769): pickle round-trips, determinism, greedy
monotonicity, cost-cache audits against exact recompute."""

import math
import pickle

import pytest

from tnco_tpu.ctree import ContractionTree
from tnco_tpu.optimize.infinite_memory import Optimizer, SimpleCostModel
from tnco_tpu.optimize.prob import (BaseProbability, Greedy,
                                    MetropolisHastings)
from tnco_tpu.testing.utils import generate_random_tensors
from tnco_tpu.utils.tn import get_random_contraction_path


def _make_opt(rng, random_seed, **kwargs):
    ts_inds, output_inds, dims = generate_random_tensors(rng,
                                                         n_output_inds=2)
    paths = get_random_contraction_path(ts_inds, output_inds,
                                        merge_paths=False, seed=random_seed)
    (path,) = [p for p in paths if p]
    ctree = ContractionTree(path, ts_inds, dims, output_inds=output_inds,
                            check_shared_inds=True)
    return Optimizer(ctree, SimpleCostModel(), seed=random_seed, **kwargs)


def test_probabilities():
    base = BaseProbability()
    assert base(10.0, 1.0) == 1.0 and base(-1.0, 0.0) == 1.0
    greedy = Greedy()
    assert greedy(-1.0, 5.0) == 1.0 and greedy(0.0, 5.0) == 1.0
    assert greedy(0.5, 5.0) == 0.0
    mh = MetropolisHastings(beta=2.0)
    assert mh(-3.0, 5.0) == 1.0
    assert mh(3.0, 0.0) == 0.0
    assert mh(5.0, 10.0) == pytest.approx((1 + 0.5)**-2.0)
    assert pickle.loads(pickle.dumps(mh)) == mh


def test_update_and_audit(rng, random_seed):
    opt = _make_opt(rng, random_seed)
    prob = MetropolisHastings(beta=1.0)
    exact0 = int(opt.total_cost)
    for _ in range(20):
        opt.update(prob)
    assert opt.is_valid()
    # Device log2 total matches exact bigint recompute
    assert opt.log2_total_cost == pytest.approx(
        math.log2(int(opt.total_cost)), abs=1e-3)
    assert opt.log2_min_total_cost == pytest.approx(
        math.log2(int(opt.min_total_cost)), abs=1e-3)
    assert int(opt.min_total_cost) <= exact0


def test_greedy_never_increases(rng, random_seed):
    opt = _make_opt(rng, random_seed)
    prev = int(opt.total_cost)
    prob = Greedy()
    for _ in range(20):
        opt.update(prob)
        cur = int(opt.total_cost)
        assert cur <= prev
        prev = cur


def test_pickle_roundtrip_and_determinism(rng, random_seed):
    opt = _make_opt(rng, random_seed)
    prob = MetropolisHastings(beta=0.5)
    for _ in range(5):
        opt.update(prob)

    clone = pickle.loads(pickle.dumps(opt))
    assert clone == opt
    assert clone.min_ctree == opt.min_ctree

    # Identical updates on both -> identical trajectories
    for _ in range(10):
        opt.update(prob)
        clone.update(prob)
    assert clone.ctree == opt.ctree
    assert clone.prng_state == opt.prng_state
    assert clone.min_total_cost == opt.min_total_cost


def test_seed_state_string_resume(rng, random_seed):
    opt = _make_opt(rng, random_seed)
    state = opt.prng_state
    assert state.startswith('jaxkey:')
    # Building a second optimizer from the serialized state reproduces
    # the same stream.
    opt2 = Optimizer(opt.ctree, SimpleCostModel(), seed=state,
                     min_ctree=opt.min_ctree)
    prob = MetropolisHastings(beta=1.0)
    for _ in range(5):
        opt.update(prob)
        opt2.update(prob)
    assert opt.ctree == opt2.ctree


def test_sparse_cost_model(rng, random_seed):
    cm = SimpleCostModel(sparse_inds={'i'}, n_projs=3)
    # union {i,j,k}: dense j*k = 12, sparse min(2, 3) = 2
    assert cm.contraction_cost({'i', 'j'}, {'j', 'k'}, {'i', 'k'},
                               {'i': 2, 'j': 3, 'k': 4}) == 24
    cm2 = SimpleCostModel(sparse_inds={'i'}, n_projs=1)
    assert cm2.contraction_cost({'i', 'j'}, {'j', 'k'}, {'i', 'k'},
                                {'i': 2, 'j': 3, 'k': 4}) == 12
    with pytest.raises(ValueError):
        SimpleCostModel(sparse_inds={'i'})

    # End-to-end with a sparse index
    ts_inds = [('a', 'b'), ('b', 'c'), ('c', 'd')]
    ctree = ContractionTree([(0, 1), (0, 1)], ts_inds, 2,
                            check_shared_inds=True)
    cm3 = SimpleCostModel(sparse_inds={'b'}, n_projs=1)
    opt = Optimizer(ctree, cm3, seed=random_seed)
    assert opt.is_valid()
    prob = MetropolisHastings(beta=1.0)
    for _ in range(10):
        opt.update(prob)
    assert opt.is_valid()
    assert int(opt.min_total_cost) <= int(
        Optimizer(ctree, cm3, seed=1).total_cost)


def test_disable_shared_inds(rng, random_seed):
    # With the guarantee disabled, D/E are always randomized and trees may
    # contract tensors without shared indices - still structurally valid.
    opt = _make_opt(rng, random_seed, disable_shared_inds=True)
    prob = BaseProbability()  # always accept: maximum churn
    for _ in range(15):
        opt.update(prob)
    ok, msg = opt.is_valid(return_message=True)
    assert ok, msg
    # Exact audit still holds
    import math
    assert opt.log2_total_cost == pytest.approx(
        math.log2(int(opt.total_cost)), abs=1e-3)
    # And pickling keeps the flag
    import pickle
    clone = pickle.loads(pickle.dumps(opt))
    assert clone.disable_shared_inds
