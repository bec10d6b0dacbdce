"""Native C++ core tests: validation/exact costs vs pure-Python oracles,
CPU SA engine validity + monotone best costs."""

import math

import numpy as np
import pytest

from tnco_tpu import native
from tnco_tpu.ctree import ContractionTree
from tnco_tpu.testing.utils import (exact_log2_total,
                                    generate_random_tensors,
                                    is_valid_contraction_tree)
from tnco_tpu.utils.tn import get_random_contraction_path

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native library unavailable')


def _random_ctree(rng, random_seed, **kwargs):
    ts_inds, output_inds, dims = generate_random_tensors(rng,
                                                         n_output_inds=2,
                                                         **kwargs)
    paths = get_random_contraction_path(ts_inds, output_inds,
                                        merge_paths=False, seed=random_seed)
    (path,) = [p for p in paths if p]
    return (ContractionTree(path, ts_inds, dims, output_inds=output_inds,
                            check_shared_inds=True), ts_inds, output_inds,
            dims)


@pytest.mark.parametrize('rep', range(5))
def test_validate_agrees_with_python(rep, rng, random_seed):
    ctree, *_ = _random_ctree(rng, random_seed)
    ok, msg = native.validate(ctree.nodes_array, ctree.inds_array,
                              check_shared_inds=True)
    assert ok, msg

    # Corrupt the tree: swap a child pointer
    bad = ctree.nodes_array.copy()
    bad[-1, 0] = bad[-1, 1]
    ok, _ = native.validate(bad, ctree.inds_array)
    assert not ok


@pytest.mark.parametrize('rep', range(5))
def test_exact_total_cost(rep, rng, random_seed):
    ctree, *_ = _random_ctree(rng, random_seed)
    dec, log2 = native.total_cost(ctree.nodes_array, ctree.inds_array,
                                  ctree.dims_array)
    assert int(dec) == ctree.total_cost_exact()
    assert log2 == pytest.approx(exact_log2_total(ctree), abs=1e-9)


def test_exact_total_cost_huge():
    # Force a cost far beyond float64 range (the float1024 regime,
    # reference include/tnco/fixed_float.hpp): a star contraction of two
    # tensors with 40 indices of dim 64 -> cost 2^240.
    n_inds = 40
    labels = [f'x{i}' for i in range(n_inds)]
    half = n_inds // 2
    ts_inds = [tuple(labels), tuple(labels[:half]), tuple(labels[half:])]
    dims = {x: 64 for x in labels}
    ctree = ContractionTree([(1, 2), (0, 1)], ts_inds, dims,
                            output_inds=())
    dec, log2 = native.total_cost(ctree.nodes_array, ctree.inds_array,
                                  ctree.dims_array)
    want = ctree.total_cost_exact()
    assert int(dec) == want
    assert log2 == pytest.approx(math.log2(want), rel=1e-12)


def test_cpu_sa_engine(rng, random_seed):
    ctree, ts_inds, output_inds, dims = _random_ctree(rng, random_seed)
    r = 8
    nodes = np.stack([ctree.nodes_array.copy() for _ in range(r)])
    inds = np.stack([ctree.inds_array.copy() for _ in range(r)])
    betas = np.linspace(0.0, 20.0, 100)
    seeds = np.arange(r, dtype=np.uint64) + random_seed
    best, moves, nodes, inds = native.sa_run(
        nodes, inds, ctree.log2_dims_array, betas, seeds, n_threads=4)
    assert moves > 0
    init = exact_log2_total(ctree)
    for i in range(r):
        out = ctree.replace_arrays(nodes[i], inds[i])
        is_valid_contraction_tree(out, ts_inds, output_inds, dims)
        assert best[i] <= init + 1e-6
        assert best[i] == pytest.approx(exact_log2_total(out), abs=1e-6)

    # Determinism: same seeds -> same bests
    nodes2 = np.stack([ctree.nodes_array.copy() for _ in range(r)])
    inds2 = np.stack([ctree.inds_array.copy() for _ in range(r)])
    best2, *_ = native.sa_run(nodes2, inds2, ctree.log2_dims_array, betas,
                              seeds, n_threads=2)
    np.testing.assert_array_equal(best, best2)


def test_checkpoint_roundtrip(tmp_path, rng, random_seed):
    from tnco_tpu.optimize.infinite_memory import SimpleCostModel
    from tnco_tpu.parallel import ReplicaRunner
    from tnco_tpu.parallel.checkpoint import load_runner, save_runner

    ctree, *_ = _random_ctree(rng, random_seed)
    runner = ReplicaRunner([ctree] * 4, list(range(4)),
                           cmodel=SimpleCostModel())
    runner.run(np.linspace(0, 10, 20), chunk_size=20)
    p = tmp_path / 'ckpt.npz'
    save_runner(p, runner)

    runner2 = ReplicaRunner([ctree] * 4, list(range(4)),
                            cmodel=SimpleCostModel())
    load_runner(p, runner2)
    np.testing.assert_array_equal(np.asarray(runner.states.min_inds),
                                  np.asarray(runner2.states.min_inds))
    assert runner2.sweeps_done == runner.sweeps_done

    # Resumed runs continue identically
    m1 = runner.run(np.linspace(10, 20, 20), chunk_size=20)
    m2 = runner2.run(np.linspace(10, 20, 20), chunk_size=20)
    np.testing.assert_array_equal(m1['log2_min_total'],
                                  m2['log2_min_total'])


def test_cpu_fw_engine(rng, random_seed):
    """Native finite-width engine: widths respected, exact costs, resume."""
    from tnco_tpu.kernels import sa_finite as saf
    from tnco_tpu.ops import bitops

    ctree, ts_inds, output_inds, dims = _random_ctree(rng, random_seed)
    max_width = 3.0
    r = 6
    # Initial slices from the device slicer (any valid set works)
    import jax.numpy as jnp
    log2d = bitops.pad_log2_dims(ctree.log2_dims_array,
                                 ctree.inds_array.shape[1])
    st = saf.init_state_fw(ctree, 0, max_width, log2d)
    slices0 = np.asarray(st.slices)

    nodes = np.stack([ctree.nodes_array.copy() for _ in range(r)])
    inds = np.stack([ctree.inds_array.copy() for _ in range(r)])
    slices = np.stack([slices0.copy() for _ in range(r)])
    skip = np.zeros(ctree.inds_array.shape[1], dtype=np.uint32)
    betas = np.linspace(0.0, 20.0, 80)
    seeds = np.arange(r, dtype=np.uint64) + random_seed

    best, moves, nodes, inds, slices = native.sa_run_fw(
        nodes, inds, slices, ctree.log2_dims_array, skip, max_width,
        betas, seeds, reslice_every=10, n_threads=3)
    assert moves > 0
    for i in range(r):
        out = ctree.replace_arrays(nodes[i], inds[i])
        is_valid_contraction_tree(out, ts_inds, output_inds, dims)
        # every tensor fits after slicing
        sl = slices[i]
        log2d_np = np.zeros(inds.shape[2] * 32)
        l2 = ctree.log2_dims_array
        log2d_np[:len(l2)] = l2
        for row in np.asarray(out.inds_array):
            bits = row & ~sl
            width = sum(
                log2d_np[32 * k + b]
                for k in range(len(bits))
                for b in range(32) if (int(bits[k]) >> b) & 1)
            assert width <= max_width + 1e-3
        # exact slice-aware cost matches reported best
        import functools as fts
        import math
        import operator as op
        from tnco_tpu.bitset import Bitset
        labels = [
            ctree.inds_order[p] for p in Bitset.from_lanes(
                sl, ctree.n_inds).positions()
        ]
        total = 0
        tins = out.inds
        dmap = out.dims
        for pos, node in enumerate(out.nodes):
            if node.is_leaf():
                continue
            union = (frozenset(tins[node.children[0]]) |
                     frozenset(tins[node.children[1]]) |
                     frozenset(labels))
            total += fts.reduce(op.mul, (dmap[x] for x in union), 1)
        assert best[i] == pytest.approx(math.log2(total), abs=1e-6)


def test_cpu_fw_engine_rescue(rng, random_seed):
    """max_new_slices > 0: rescue slices keep every tensor within width
    and the reported best matches an exact slice-aware recompute."""
    import functools as fts
    import operator as op

    from tnco_tpu.bitset import Bitset
    from tnco_tpu.kernels import sa_finite as saf
    from tnco_tpu.ops import bitops

    ctree, ts_inds, output_inds, dims = _random_ctree(rng, random_seed)
    max_width = 2.5
    r = 4
    log2d = bitops.pad_log2_dims(ctree.log2_dims_array,
                                 ctree.inds_array.shape[1])
    st = saf.init_state_fw(ctree, 0, max_width, log2d)
    slices0 = np.asarray(st.slices)

    nodes = np.stack([ctree.nodes_array.copy() for _ in range(r)])
    inds = np.stack([ctree.inds_array.copy() for _ in range(r)])
    slices = np.stack([slices0.copy() for _ in range(r)])
    skip = np.zeros(ctree.inds_array.shape[1], dtype=np.uint32)
    betas = np.linspace(0.0, 10.0, 60)
    seeds = np.arange(r, dtype=np.uint64) + random_seed

    best, moves, nodes, inds, slices = native.sa_run_fw(
        nodes, inds, slices, ctree.log2_dims_array, skip, max_width,
        betas, seeds, reslice_every=0, max_new_slices=2, n_threads=2)
    assert moves > 0
    log2d_np = np.zeros(inds.shape[2] * 32)
    l2 = ctree.log2_dims_array
    log2d_np[:len(l2)] = l2
    for i in range(r):
        out = ctree.replace_arrays(nodes[i], inds[i])
        is_valid_contraction_tree(out, ts_inds, output_inds, dims)
        sl = slices[i]
        for row in np.asarray(out.inds_array):
            bits = row & ~sl
            width = sum(
                log2d_np[32 * k + b]
                for k in range(len(bits))
                for b in range(32) if (int(bits[k]) >> b) & 1)
            assert width <= max_width + 1e-3
        labels = [
            ctree.inds_order[p] for p in Bitset.from_lanes(
                sl, ctree.n_inds).positions()
        ]
        total = 0
        tins = out.inds
        dmap = out.dims
        for node in out.nodes:
            if node.is_leaf():
                continue
            union = (frozenset(tins[node.children[0]]) |
                     frozenset(tins[node.children[1]]) |
                     frozenset(labels))
            total += fts.reduce(op.mul, (dmap[x] for x in union), 1)
        assert best[i] == pytest.approx(math.log2(total), abs=1e-6)
