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


def _replay_cost_sparse(path, ts_inds, output_inds, dims, sparse, n_projs,
                        slices=frozenset()):
    """Replay with the sparse rule: prod(dense) * min(prod(sparse), P)."""
    ts = [frozenset(xs) for xs in ts_inds]
    hyper_count = get_hyper_count(ts_inds, output_inds=output_inds)
    total = 0
    for x, y in (sorted(p) for p in path):
        ys = ts.pop(y)
        xs = ts.pop(x)
        union = xs | ys | frozenset(slices)
        dense = fts.reduce(op.mul,
                           (dims[i] for i in union if i not in sparse), 1)
        sp = fts.reduce(op.mul,
                        (dims[i] for i in union if i in sparse), 1)
        total += dense * min(sp, n_projs)
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


def test_replay_sparse_inds(rng, random_seed):
    """Sparse-index cost model end to end (simple_sparse_inds.hpp rule)."""
    ts_inds, output_inds, dims = generate_random_tensors(
        rng, min_n_tensors=6, use_mixed_labels=False)
    inner = sorted({x for xs in ts_inds for x in xs} - set(output_inds))
    k = rng.randint(1, max(1, len(inner) // 3))
    sparse = frozenset(rng.sample(inner, k))
    n_projs = rng.randint(1, 32)
    paths = get_random_contraction_path(ts_inds, output_inds,
                                        merge_paths=False, seed=random_seed)
    (path,) = [p for p in paths if p]
    ctree = ContractionTree(path, ts_inds, dims, output_inds=output_inds,
                            check_shared_inds=True)
    opt = Optimizer(ctree,
                    SimpleCostModel(sparse_inds=sparse, n_projs=n_projs),
                    seed=random_seed)
    opt.update_many(MetropolisHastings(), [b * 0.5 for b in range(80)])
    replayed = _replay_cost_sparse(opt.min_ctree.path(), ts_inds,
                                   output_inds, dims, sparse, n_projs)
    assert replayed == int(opt.min_total_cost)


def test_replay_fw_width_respected(rng, random_seed):
    """Every min-tree tensor fits max_width once min_slices are removed
    (reference greedy/optimizer.hpp:405-423 validity rule)."""
    import math

    ts_inds, output_inds, dims = generate_random_tensors(
        rng, min_n_tensors=6, n_output_inds=1)
    max_width = 2.0 + 2.0 * rng.random()
    paths = get_random_contraction_path(ts_inds, output_inds,
                                        merge_paths=False, seed=random_seed)
    (path,) = [p for p in paths if p]
    ctree = ContractionTree(path, ts_inds, dims, output_inds=output_inds,
                            check_shared_inds=True)
    opt = FWOptimizer(ctree, FWCostModel(max_width=max_width),
                      seed=random_seed)
    opt.update_many(MetropolisHastings(), [b * 0.5 for b in range(60)],
                    update_slices_every=10)
    slices = opt.min_slices
    for node_inds in opt.min_ctree.inds:
        w = sum(math.log2(dims[i]) for i in set(node_inds) - set(slices))
        assert w <= max_width + 1e-3
    replayed = _replay_cost(opt.min_ctree.path(), ts_inds, output_inds,
                            dims, slices)
    assert replayed == int(opt.min_total_cost)


def test_fw_result_executes_sliced(rng, random_seed):
    """The FW optimizer's (path, min_slices) EXECUTES correctly: the
    sliced contraction (one projected pass per slice assignment, summed)
    equals an independent dense ``np.einsum`` of the network.  Ties the
    finite-width cost semantics (every contraction repeats per slice
    value, simple.hpp:139-144) to actual numerics — the reference never
    executes sliced contractions."""
    import string

    import numpy as np

    from tnco_tpu.utils.tn import contract_sliced

    ts_inds, output_inds, dims = generate_random_tensors(
        rng, n_tensors=6, n_output_inds=0, min_dim=2, max_dim=3,
        use_mixed_labels=False)
    arrays = [
        np.asarray(rng.choices(range(-2, 3),
                               k=int(np.prod([dims[x] for x in xs]))),
                   dtype=float).reshape([dims[x] for x in xs])
        for xs in ts_inds
    ]
    letter = {x: string.ascii_letters[i]
              for i, x in enumerate(dict.fromkeys(
                  x for xs in ts_inds for x in xs))}
    sub = ','.join(''.join(letter[x] for x in xs) for xs in ts_inds)
    want = np.einsum(sub + '->', *arrays)

    paths = get_random_contraction_path(ts_inds, output_inds,
                                        merge_paths=False,
                                        seed=random_seed)
    (path,) = [p for p in paths if p]
    ctree = ContractionTree(path, ts_inds, dims, output_inds=output_inds,
                            check_shared_inds=True)
    opt = FWOptimizer(ctree, FWCostModel(max_width=1.5), seed=random_seed)
    opt.update_many(MetropolisHastings(), [b * 0.5 for b in range(40)],
                    update_slices_every=10)

    slices = tuple(sorted(opt.min_slices))
    _, _, (got,) = contract_sliced(opt.min_ctree.path(), ts_inds, slices,
                                   output_inds, arrays=list(arrays))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9,
                               atol=1e-9)


def test_replay_multiple_components(rng, random_seed):
    """Per-component optimization + merge replays over the full TN
    (reference app flow, infinite_memory/sa.py:230-231)."""
    from tnco_tpu.utils.tn import merge_contraction_paths

    ts_inds, output_inds, dims = generate_random_tensors(
        rng, min_n_tensors=8, max_n_tensors=14, n_ccs=2)
    paths = get_random_contraction_path(ts_inds, output_inds,
                                        merge_paths=False, seed=random_seed)
    if not any(paths):
        pytest.skip('all components are single tensors')
    merged = merge_contraction_paths(len(ts_inds), paths)
    # The merged path must replay cleanly over the full TN with the
    # hyper-count bookkeeping intact (single final tensor, finite cost).
    total = _replay_cost(merged, ts_inds, output_inds, dims)
    assert total > 0


def test_replay_device_engine(rng, random_seed):
    """Replica-batch device engine end to end: the best tree's replayed
    exact cost equals the engine's reported min log2 total."""
    import math

    import numpy as np

    from tnco_tpu.parallel.replicas import ReplicaRunner

    ts_inds, output_inds, dims = generate_random_tensors(
        rng, n_output_inds=1)
    order = tuple(dict.fromkeys(x for xs in ts_inds for x in xs))
    ctrees = []
    for r in range(4):
        paths = get_random_contraction_path(ts_inds, output_inds,
                                            merge_paths=False,
                                            seed=random_seed + r)
        (path,) = [p for p in paths if p]
        ctrees.append(
            ContractionTree(path, ts_inds, dims, output_inds=output_inds,
                            check_shared_inds=True, inds_order=order))
    runner = ReplicaRunner(ctrees, list(range(4)), engine='batched')
    runner.run(np.linspace(0.0, 20.0, 50, dtype=np.float32),
               chunk_size=25)
    idx, best_log2 = runner.best()
    best_tree = runner.min_ctree(idx)
    replayed = _replay_cost(best_tree.path(), ts_inds, output_inds, dims)
    assert np.isclose(math.log2(replayed), best_log2, rtol=1e-5)
