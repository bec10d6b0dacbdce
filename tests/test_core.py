"""Core data-model tests: Bitset, OrderedFrozenSet, Node, ContractionTree.

Differential-oracle style after the reference suite (tests/test_core.py):
every operation is recomputed with pure-Python sets/bigints.
"""

import pickle
from random import Random

import numpy as np
import pytest

from tnco_tpu.bitset import Bitset, pack_lanes, unpack_lanes
from tnco_tpu.ctree import ContractionTree, Node, get_contraction
from tnco_tpu.ordered_frozenset import OrderedFrozenSet
from tnco_tpu.testing.utils import (exact_log2_total,
                                    generate_random_tensors,
                                    is_valid_contraction_tree)
from tnco_tpu.utils.tn import get_random_contraction_path


@pytest.mark.parametrize('rep', range(20))
def test_bitset_vs_frozenset(rep, rng):
    n = rng.randint(1, 100)
    pa = frozenset(rng.sample(range(n), k=rng.randint(0, n)))
    pb = frozenset(rng.sample(range(n), k=rng.randint(0, n)))
    a, b = Bitset(pa, n=n), Bitset(pb, n=n)

    assert frozenset(a.positions()) == pa
    assert a.count() == len(pa)
    assert frozenset((a & b).positions()) == pa & pb
    assert frozenset((a | b).positions()) == pa | pb
    assert frozenset((a ^ b).positions()) == pa ^ pb
    assert frozenset((a - b).positions()) == pa - pb
    assert frozenset((~a).positions()) == frozenset(range(n)) - pa
    assert a.intersects(b) == bool(pa & pb)
    assert a.issubset(b) == pa.issubset(pb)
    assert a.issuperset(b) == pa.issuperset(pb)
    assert (a <= b) == (pa <= pb)
    assert (a < b) == (pa < pb)

    # String codec round trip (char j = bit j)
    assert Bitset(str(a)) == a
    assert pickle.loads(pickle.dumps(a)) == a

    # Lane pack/unpack round trip
    lanes = a.lanes()
    assert unpack_lanes(lanes) == a.mask
    assert Bitset.from_lanes(lanes, n) == a
    assert np.array_equal(pack_lanes(a.mask, n), lanes)


def test_bitset_validation():
    with pytest.raises(ValueError):
        Bitset([5], n=3)
    with pytest.raises(ValueError):
        Bitset('012')
    b = Bitset('0101')
    assert b.positions() == (1, 3)
    assert str(b.set(0)) == '1101'
    assert str(b.reset(1)) == '0001'


@pytest.mark.parametrize('rep', range(10))
def test_ordered_frozenset(rep, rng):
    xs = [rng.randrange(50) for _ in range(rng.randint(0, 30))]
    ys = [rng.randrange(50) for _ in range(rng.randint(0, 30))]
    a, b = OrderedFrozenSet(xs), OrderedFrozenSet(ys)
    fa, fb = frozenset(xs), frozenset(ys)
    assert frozenset(a) == fa and len(a) == len(fa)
    assert frozenset(a & b) == fa & fb
    assert frozenset(a | b) == fa | fb
    assert frozenset(a - b) == fa - fb
    assert frozenset(a ^ b) == fa ^ fb
    assert a.issubset(b) == fa.issubset(fb)
    assert a == fa
    assert hash(a) == hash(OrderedFrozenSet(reversed(xs)))
    # Insertion order is preserved
    assert list(a) == list(dict.fromkeys(xs))
    assert pickle.loads(pickle.dumps(a)) == a


def test_node():
    n = Node((0, 1), 2)
    assert not n.is_leaf() and not n.is_root()
    assert Node().is_leaf() and Node().is_root()
    with pytest.raises(ValueError):
        Node((0, 0), 1)
    with pytest.raises(ValueError):
        Node((0, None), 1)
    with pytest.raises(ValueError):
        Node((0, 1), 0)
    assert pickle.loads(pickle.dumps(n)) == n


def test_ctree_chain():
    # README 4-tensor chain: i-j-k-l, all dims 2
    path = [(0, 1), (0, 1), (0, 1)]
    ts_inds = [['i', 'j'], ['j', 'k'], ['k', 'l'], ['l', 'm']]
    dims = {'i': 2, 'j': 2, 'k': 2, 'l': 2, 'm': 2}
    ctree = ContractionTree(path, ts_inds, dims, check_shared_inds=True)
    assert len(ctree) == 7
    assert ctree.n_leaves == 4
    assert ctree.max_width() == 2.0
    assert ctree.output_inds() == frozenset({'i', 'm'})
    # Exact cost: ((ij,jk->ik): 8) + ((ik,kl->il): 8) + ((il,lm->im): 8)
    assert ctree.total_cost_exact() == 24
    is_valid_contraction_tree(ctree, ts_inds, None, dims)


@pytest.mark.parametrize('hyper', [False, True])
@pytest.mark.parametrize('rep', range(8))
def test_ctree_random_roundtrip(rep, hyper, rng, random_seed):
    ts_inds, output_inds, dims = generate_random_tensors(
        rng,
        n_hyper_edges=2 if hyper else 0,
        n_output_inds=2,
        n_hyper_output_inds=1 if hyper else 0)
    paths = get_random_contraction_path(ts_inds,
                                        output_inds,
                                        merge_paths=False,
                                        seed=random_seed)
    (path,) = [p for p in paths if p]
    ctree = ContractionTree(path,
                            ts_inds,
                            dims,
                            output_inds=output_inds,
                            check_shared_inds=True)
    is_valid_contraction_tree(ctree, ts_inds, output_inds, dims)

    # Root indices must be the output indices present in the network
    want_out = frozenset(output_inds).intersection(
        x for xs in ts_inds for x in xs)
    assert ctree.output_inds() == want_out

    # path() round trip: rebuilding from the returned path gives the same
    # tree-cost (tree shape may renumber, cost is the invariant).
    path2 = ctree.path()
    ctree2 = ContractionTree(path2,
                             ts_inds,
                             dims,
                             output_inds=output_inds,
                             check_shared_inds=True)
    assert ctree2.total_cost_exact() == ctree.total_cost_exact()
    assert ctree2.output_inds() == ctree.output_inds()

    # Exact log2 total vs oracle
    assert exact_log2_total(ctree) == pytest.approx(
        np.log2(float(ctree.total_cost_exact())), rel=1e-12)


def test_ctree_requires_output_inds_for_hyper():
    ts_inds = [['i', 'j'], ['i', 'j'], ['i', 'k']]
    with pytest.raises(ValueError):
        ContractionTree([(0, 1), (0, 1)], ts_inds, 2)


def test_get_contraction_postorder():
    path = [(0, 1), (0, 1)]
    ctree = ContractionTree(path, [['a', 'b'], ['b', 'c'], ['c', 'd']],
                            2)
    contraction = get_contraction(ctree)
    assert len(contraction) == 2
    # Children appear before parents
    seen = set(range(ctree.n_leaves))
    for c0, c1, out in contraction:
        assert c0 in seen and c1 in seen
        seen.add(out)
    assert contraction[-1][2] == len(ctree) - 1
