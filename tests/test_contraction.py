"""End-to-end path-replay differential test (reference
tests/test_contraction.py:60-352): random TN -> SA -> replay the returned
``min_ctree.path()`` in pure Python with hyper-count bookkeeping and check
the replayed total cost matches the optimizer's exactly."""

import functools as fts
import operator as op

import pytest

from tnco_tpu.ctree import ContractionTree
from tnco_tpu.optimize.finite_width import (
    Optimizer as FWOptimizer, SimpleCostModel as FWCostModel)
from tnco_tpu.optimize.infinite_memory import Optimizer, SimpleCostModel
from tnco_tpu.optimize.prob import MetropolisHastings
from tnco_tpu.testing.utils import generate_random_tensors
from tnco_tpu.utils.tn import get_hyper_count, get_random_contraction_path


def _replay_cost(path, ts_inds, output_inds, dims, slices=frozenset()):
    """Pure-Python replay: total cost of a linear path with hyper rules."""
    ts = [frozenset(xs) for xs in ts_inds]
    hyper_count = get_hyper_count(ts_inds, output_inds=output_inds)
    total = 0
    for x, y in (sorted(p) for p in path):
        ys = ts.pop(y)
        xs = ts.pop(x)
        union = xs | ys | frozenset(slices)
        total += fts.reduce(op.mul, (dims[i] for i in union), 1)
        shared = xs & ys
        zs = xs ^ ys
        for i in shared:
            assert hyper_count[i] > 0
            hyper_count[i] -= 1
            if hyper_count[i] > 0:
                zs |= {i}
        ts.append(zs)
    assert len(ts) == 1
    return total


@pytest.mark.parametrize('hyper', [False, True])
def test_replay_infinite_memory(hyper, rng, random_seed):
    ts_inds, output_inds, dims = generate_random_tensors(
        rng, n_output_inds=2, n_hyper_edges=2 if hyper else 0,
        n_hyper_output_inds=1 if hyper else 0)
    paths = get_random_contraction_path(ts_inds, output_inds,
                                        merge_paths=False, seed=random_seed)
    (path,) = [p for p in paths if p]
    ctree = ContractionTree(path, ts_inds, dims, output_inds=output_inds,
                            check_shared_inds=True)
    opt = Optimizer(ctree, SimpleCostModel(), seed=random_seed)
    opt.update_many(MetropolisHastings(), [b * 0.5 for b in range(100)])

    replayed = _replay_cost(opt.min_ctree.path(), ts_inds, output_inds,
                            dims)
    assert replayed == int(opt.min_total_cost)


def test_replay_finite_width(rng, random_seed):
    ts_inds, output_inds, dims = generate_random_tensors(rng,
                                                         n_output_inds=2)
    paths = get_random_contraction_path(ts_inds, output_inds,
                                        merge_paths=False, seed=random_seed)
    (path,) = [p for p in paths if p]
    ctree = ContractionTree(path, ts_inds, dims, output_inds=output_inds,
                            check_shared_inds=True)
    opt = FWOptimizer(ctree, FWCostModel(max_width=3.0), seed=random_seed)
    opt.update_many(MetropolisHastings(), [b * 0.5 for b in range(60)],
                    update_slices_every=10)

    slices = opt.min_slices
    replayed = _replay_cost(opt.min_ctree.path(), ts_inds, output_inds,
                            dims, slices)
    assert replayed == int(opt.min_total_cost)
