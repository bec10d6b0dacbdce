"""Finite-width optimizer tests (parity with reference
tests/test_utils.py:775-949): width-respecting slices, cache audits, pickle
round-trips, the max_number_new_slices rescue path."""

import math
import pickle

import pytest

from tnco_tpu.ctree import ContractionTree
from tnco_tpu.optimize.finite_width import Optimizer, SimpleCostModel
from tnco_tpu.optimize.prob import Greedy, MetropolisHastings
from tnco_tpu.testing.utils import generate_random_tensors
from tnco_tpu.utils.tn import get_random_contraction_path


def _make(rng, random_seed, max_width, **kwargs):
    ts_inds, output_inds, dims = generate_random_tensors(rng,
                                                         n_output_inds=2)
    paths = get_random_contraction_path(ts_inds, output_inds,
                                        merge_paths=False, seed=random_seed)
    (path,) = [p for p in paths if p]
    ctree = ContractionTree(path, ts_inds, dims, output_inds=output_inds,
                            check_shared_inds=True)
    cmodel = SimpleCostModel(max_width=max_width)
    return Optimizer(ctree, cmodel, seed=random_seed, **kwargs), ctree


def test_cost_model_widths():
    cm = SimpleCostModel(max_width=8)
    dims = {'i': 2, 'j': 4, 'k': 8}
    assert cm.width({'i', 'j'}, dims) == pytest.approx(3.0)
    assert cm.delta_width({'i', 'j'}, dims, 'k') == pytest.approx(3.0)
    assert cm.delta_width({'i', 'j'}, dims, 'j') == pytest.approx(-2.0)
    # Slices multiply every contraction
    assert cm.contraction_cost({'i'}, {'i', 'j'}, {'j'}, dims,
                               slices={'k'}) == 2 * 4 * 8
    # Sparse width capped at log2(n_projs)
    cms = SimpleCostModel(max_width=8, sparse_inds={'j', 'k'}, n_projs=4)
    assert cms.width({'i', 'j', 'k'}, dims) == pytest.approx(1 + 2.0)
    assert cms.contraction_cost({'i', 'j'}, {'j', 'k'}, {'i', 'k'},
                                dims) == 2 * min(32, 4)


@pytest.mark.parametrize('max_width', [2.0, 4.0])
@pytest.mark.parametrize('rep', range(3))
def test_update_respects_width(rep, max_width, rng, random_seed):
    opt, _ = _make(rng, random_seed, max_width)
    assert opt.is_valid()
    prob = MetropolisHastings(beta=1.0)
    for i in range(15):
        opt.update(prob, update_slices=(i % 5 == 0))
    ok, msg = opt.is_valid(return_message=True)
    assert ok, msg
    # Exact vs device totals
    assert opt.log2_total_cost == pytest.approx(
        math.log2(int(opt.total_cost)), abs=1e-3)
    assert opt.log2_min_total_cost == pytest.approx(
        math.log2(int(opt.min_total_cost)), abs=1e-3)
    # All tensors fit after slicing
    dims = opt.ctree.dims
    for xs in opt.ctree.inds:
        assert opt.cmodel.width(frozenset(xs) - opt.slices,
                                dims) <= max_width + 1e-3


def test_wide_limit_has_no_slices(rng, random_seed):
    opt, _ = _make(rng, random_seed, max_width=1e6)
    assert opt.slices == frozenset()
    prob = MetropolisHastings(beta=1.0)
    for _ in range(10):
        opt.update(prob)
    assert opt.slices == frozenset()
    assert opt.is_valid()


def test_max_number_new_slices(rng, random_seed):
    opt, _ = _make(rng, random_seed, max_width=2.0,
                   max_number_new_slices=2)
    prob = MetropolisHastings(beta=0.5)
    for i in range(15):
        opt.update(prob, update_slices=(i % 5 == 0))
    ok, msg = opt.is_valid(return_message=True)
    assert ok, msg


def test_greedy_monotone_fw(rng, random_seed):
    opt, _ = _make(rng, random_seed, max_width=3.0)
    prob = Greedy()
    prev = int(opt.total_cost)
    for i in range(10):
        opt.update(prob, update_slices=(i % 3 == 0))
        cur = int(opt.total_cost)
        # reslice also only applies when strictly better
        assert cur <= prev
        prev = cur


def test_pickle_and_determinism_fw(rng, random_seed):
    opt, _ = _make(rng, random_seed, max_width=3.0)
    prob = MetropolisHastings(beta=0.7)
    for _ in range(5):
        opt.update(prob)
    clone = pickle.loads(pickle.dumps(opt))
    assert clone == opt
    for i in range(8):
        opt.update(prob, update_slices=(i % 2 == 0))
        clone.update(prob, update_slices=(i % 2 == 0))
    assert clone.ctree == opt.ctree
    assert clone.slices == opt.slices
    assert clone.min_slices == opt.min_slices
    assert clone.min_total_cost == opt.min_total_cost


def test_skip_slices(rng, random_seed):
    # A label that must never be sliced
    ts_inds, output_inds, dims = generate_random_tensors(
        rng, n_output_inds=1, min_dim=2, max_dim=2)
    paths = get_random_contraction_path(ts_inds, output_inds,
                                        merge_paths=False, seed=random_seed)
    (path,) = [p for p in paths if p]
    ctree = ContractionTree(path, ts_inds, dims, output_inds=output_inds,
                            check_shared_inds=True)
    skip = next(iter(ctree.all_inds()))
    opt = Optimizer(ctree, SimpleCostModel(max_width=2.0),
                    seed=random_seed, skip_slices=[skip])
    prob = MetropolisHastings(beta=1.0)
    for i in range(10):
        opt.update(prob, update_slices=True)
        assert skip not in opt.slices
        assert skip not in opt.min_slices
    assert opt.is_valid()
