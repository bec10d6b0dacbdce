"""Host Parallel fan-out and mesh-sharded replica tests."""

import time

import numpy as np
import pytest

import jax

from tnco_tpu.ctree import ContractionTree
from tnco_tpu.optimize.infinite_memory import SimpleCostModel
from tnco_tpu.parallel import make_mesh, Parallel, ReplicaRunner
from tnco_tpu.testing.utils import generate_random_tensors
from tnco_tpu.utils.tn import get_random_contraction_path


def test_host_parallel_basic():
    def core(seed, *, idx, status, stop, metric):
        status[idx] = 1.0
        metric[idx] = seed * 2.0
        return seed + 100

    out = Parallel(core, seed=[1, 2, 3], n_jobs=2,
                   buffers=[('metric', 'f')])
    assert out == [101, 102, 103]


def test_host_parallel_timeout_stop():
    def core(seed, *, idx, status, stop):
        n = 0
        while not stop[idx] and n < 500:
            time.sleep(0.01)
            n += 1
        return n

    t0 = time.perf_counter()
    out = Parallel(core, seed=[0, 1], n_jobs=2, timeout=0.2)
    assert time.perf_counter() - t0 < 3.0
    assert all(n < 500 for n in out)

    with pytest.raises(ValueError):
        Parallel(core, seed=[0], n_jobs=0)


def test_swap_with_nn_roundtrip(rng, random_seed):
    ts_inds, output_inds, dims = generate_random_tensors(rng,
                                                         n_output_inds=1)
    paths = get_random_contraction_path(ts_inds, output_inds,
                                        merge_paths=False, seed=random_seed)
    (path,) = [p for p in paths if p]
    ctree = ContractionTree(path, ts_inds, dims, output_inds=output_inds)
    nodes0 = ctree.nodes_array.copy()
    # Pick a node with a grandparent; remember its uncle
    pos = next(i for i in range(len(ctree))
               if ctree.nodes_array[i, 2] != -1 and
               ctree.nodes_array[ctree.nodes_array[i, 2], 2] != -1)
    parent0 = nodes0[pos, 2]
    grand0 = nodes0[parent0, 2]
    uncle0 = (nodes0[grand0, 1]
              if nodes0[grand0, 0] == parent0 else nodes0[grand0, 0])
    ctree.swap_with_nn(pos)
    # Tree structure stays consistent (index sets are the optimizer's job:
    # a bare swap leaves them stale, like the reference tree.hpp move)
    nodes = ctree.nodes_array
    for i in range(len(ctree)):
        p = nodes[i, 2]
        if p != -1:
            assert i in (nodes[p, 0], nodes[p, 1])
    assert not np.array_equal(nodes, nodes0)
    # Swapping the displaced uncle back restores the original links
    ctree.swap_with_nn(uncle0)
    np.testing.assert_array_equal(ctree.nodes_array, nodes0)


def test_mesh_sharded_runner(rng, random_seed):
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    ts_inds, output_inds, dims = generate_random_tensors(rng,
                                                         n_tensors=10,
                                                         n_output_inds=1)
    order = tuple(dict.fromkeys(x for xs in ts_inds for x in xs))
    ctrees = []
    for r in range(16):
        paths = get_random_contraction_path(ts_inds, output_inds,
                                            merge_paths=False,
                                            seed=random_seed + r)
        (path,) = [p for p in paths if p]
        ctrees.append(
            ContractionTree(path, ts_inds, dims, output_inds=output_inds,
                            check_shared_inds=True, inds_order=order))
    mesh = make_mesh(jax.devices()[:8])
    runner = ReplicaRunner(ctrees, list(range(16)),
                           cmodel=SimpleCostModel(), mesh=mesh)
    out = runner.run(np.linspace(0, 10, 16), chunk_size=16)
    assert out['sweeps'] == 16

    # Same computation without the mesh gives identical results
    runner1 = ReplicaRunner(ctrees, list(range(16)),
                            cmodel=SimpleCostModel())
    out1 = runner1.run(np.linspace(0, 10, 16), chunk_size=16)
    np.testing.assert_allclose(out['log2_min_total'],
                               out1['log2_min_total'], rtol=1e-6)
    assert runner.best()[1] == pytest.approx(runner1.best()[1], rel=1e-6)


def test_engines_agree(rng, random_seed):
    ts_inds, output_inds, dims = generate_random_tensors(rng,
                                                         n_tensors=8,
                                                         n_output_inds=1)
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
    betas = np.linspace(0, 10, 24)
    outs = {}
    for engine in ('batched', 'vmapped'):
        runner = ReplicaRunner(ctrees, list(range(4)),
                               cmodel=SimpleCostModel(), engine=engine)
        runner.run(betas, chunk_size=24)
        outs[engine] = (runner.log2_min_totals(),
                        runner.min_ctree(0), runner.ctree(1),
                        runner.moves_done)
    np.testing.assert_allclose(outs['batched'][0], outs['vmapped'][0],
                               rtol=1e-6)
    assert outs['batched'][1] == outs['vmapped'][1]
    assert outs['batched'][2] == outs['vmapped'][2]
    assert outs['batched'][3] == outs['vmapped'][3]


def test_native_engine_runner(rng, random_seed):
    from tnco_tpu import native
    if not native.available():
        pytest.skip('native library unavailable')
    from tnco_tpu.testing.utils import (exact_log2_total,
                                        is_valid_contraction_tree)

    ts_inds, output_inds, dims = generate_random_tensors(rng,
                                                         n_tensors=10,
                                                         n_output_inds=1)
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
    runner = ReplicaRunner(ctrees, list(range(4)),
                           cmodel=SimpleCostModel(), engine='native')
    out = runner.run(np.linspace(0, 30, 100), chunk_size=50)
    assert out['moves'] > 0
    bests = runner.log2_min_totals()
    for i in range(4):
        tree = runner.min_ctree(i)
        is_valid_contraction_tree(tree, ts_inds, output_inds, dims)
        assert bests[i] == pytest.approx(exact_log2_total(tree), abs=1e-6)
        assert bests[i] <= exact_log2_total(ctrees[i]) + 1e-6
        # current tree also valid
        is_valid_contraction_tree(runner.ctree(i), ts_inds, output_inds,
                                  dims)
    idx, val = runner.best()
    assert val == pytest.approx(float(bests.min()))


def test_exchange_best(rng, random_seed):
    from tnco_tpu.parallel.replicas import exchange_best
    from tnco_tpu.testing.utils import is_valid_contraction_tree

    ts_inds, output_inds, dims = generate_random_tensors(rng,
                                                         n_tensors=8,
                                                         n_output_inds=1)
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
    runner.run(np.linspace(0, 5, 16), chunk_size=16)
    before = np.asarray(runner.states.log2_total)
    runner.states = exchange_best(runner.states, fraction=0.5)
    after = np.asarray(runner.states.log2_total)
    assert after.max() <= before.max() + 1e-6
    assert after.min() == pytest.approx(before.min())
    # Continue running and stay valid
    runner.run(np.linspace(5, 10, 16), chunk_size=16)
    for i in range(8):
        is_valid_contraction_tree(runner.ctree(i), ts_inds, output_inds,
                                  dims)
        is_valid_contraction_tree(runner.min_ctree(i), ts_inds,
                                  output_inds, dims)


def test_native_fw_engine_runner(rng, random_seed):
    from tnco_tpu import native
    if not native.available():
        pytest.skip('native library unavailable')
    from tnco_tpu.optimize.finite_width import (
        SimpleCostModel as FWCostModel)
    from tnco_tpu.parallel.replicas import ReplicaRunnerFW
    from tnco_tpu.testing.utils import is_valid_contraction_tree

    ts_inds, output_inds, dims = generate_random_tensors(rng,
                                                         n_tensors=10,
                                                         n_output_inds=1)
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
    max_width = 3.0
    runner = ReplicaRunnerFW(ctrees, list(range(4)),
                             cmodel=FWCostModel(max_width=max_width),
                             engine='native')
    out = runner.run(np.linspace(0, 20, 60), update_slices=10,
                     chunk_size=30)
    assert out['moves'] > 0
    import math
    for i in range(4):
        tree = runner.min_ctree(i)
        is_valid_contraction_tree(tree, ts_inds, output_inds, dims)
        # width bound holds after slicing
        from tnco_tpu.bitset import Bitset
        sl = runner.min_slices_lanes(i)
        labels = frozenset(
            order[p] for p in Bitset.from_lanes(sl,
                                                tree.n_inds).positions())
        dmap = tree.dims
        for xs in tree.inds:
            width = sum(math.log2(dmap[x])
                        for x in frozenset(xs) - labels)
            assert width <= max_width + 1e-3


def test_exchange_best_sharded_2d_mesh(rng, random_seed):
    """ICI-only exchange on a ('dcn', 'ici') mesh: groups don't mix."""
    from tnco_tpu.parallel.replicas import exchange_best_sharded
    from tnco_tpu.testing.utils import is_valid_contraction_tree

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    ts_inds, output_inds, dims = generate_random_tensors(rng,
                                                         n_tensors=10,
                                                         n_output_inds=1)
    order = tuple(dict.fromkeys(x for xs in ts_inds for x in xs))
    ctrees = []
    for r in range(16):
        paths = get_random_contraction_path(ts_inds, output_inds,
                                            merge_paths=False,
                                            seed=random_seed + r)
        (path,) = [p for p in paths if p]
        ctrees.append(
            ContractionTree(path, ts_inds, dims, output_inds=output_inds,
                            check_shared_inds=True, inds_order=order))
    mesh = make_mesh(jax.devices()[:8], shape=(2, 4),
                     axis_names=('dcn', 'ici'))
    runner = ReplicaRunner(ctrees, list(range(16)),
                           cmodel=SimpleCostModel(), mesh=mesh,
                           engine='batched')
    runner.run(np.linspace(0, 5, 8), chunk_size=8)
    before = np.asarray(runner.states.log2_total)
    # Groups: lanes are laid out contiguously per device -> first 8 lanes
    # live on the dcn=0 row, last 8 on dcn=1.
    g0_min, g1_min = before[:8].min(), before[8:].min()

    runner.states = exchange_best_sharded(runner.states, mesh,
                                          axis_names=('ici',),
                                          fraction=1.0)
    after = np.asarray(runner.states.log2_total)
    # Every lane in a group now carries its group's best cost only
    np.testing.assert_allclose(after[:8], g0_min, rtol=1e-6)
    np.testing.assert_allclose(after[8:], g1_min, rtol=1e-6)

    # Full-mesh exchange crosses DCN too
    runner.states = exchange_best_sharded(runner.states, mesh,
                                          fraction=1.0)
    after2 = np.asarray(runner.states.log2_total)
    np.testing.assert_allclose(after2, min(g0_min, g1_min), rtol=1e-6)

    # Trees stay structurally valid and the runner keeps going
    runner.run(np.linspace(5, 10, 8), chunk_size=8,
               exchange_every=1, exchange_axes=('ici',))
    for i in range(0, 16, 5):
        is_valid_contraction_tree(runner.ctree(i), ts_inds, output_inds,
                                  dims)


def test_multiwalk_mesh_exchange(rng, random_seed):
    """Multiwalk engine on a 2-D mesh with ICI exchange between chunks."""
    from tnco_tpu.testing.utils import is_valid_contraction_tree

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    ts_inds, output_inds, dims = generate_random_tensors(rng,
                                                         n_tensors=10,
                                                         n_output_inds=1)
    order = tuple(dict.fromkeys(x for xs in ts_inds for x in xs))
    ctrees = []
    for r in range(16):
        paths = get_random_contraction_path(ts_inds, output_inds,
                                            merge_paths=False,
                                            seed=random_seed + r)
        (path,) = [p for p in paths if p]
        ctrees.append(
            ContractionTree(path, ts_inds, dims, output_inds=output_inds,
                            check_shared_inds=True, inds_order=order))
    mesh = make_mesh(jax.devices()[:8], shape=(2, 4),
                     axis_names=('dcn', 'ici'))
    runner = ReplicaRunner(ctrees, list(range(16)), mesh=mesh,
                           engine='multiwalk', n_walks=4)
    out = runner.run(np.linspace(0, 10, 32), chunk_size=8,
                     exchange_every=1, exchange_axes=('ici',))
    assert out['moves'] == 32 * 4 * 16
    best_i, best = runner.best()
    is_valid_contraction_tree(runner.min_ctree(best_i), ts_inds,
                              output_inds, dims)
    import math
    assert best == pytest.approx(
        math.log2(runner.min_ctree(best_i).total_cost_exact()), abs=1e-3)
    # Exchange mid-walk keeps every lane's current tree structurally valid
    for i in range(0, 16, 5):
        is_valid_contraction_tree(runner.ctree(i), ts_inds, output_inds,
                                  dims)


def test_exchange_best_fw(rng, random_seed):
    from tnco_tpu.optimize.finite_width import SimpleCostModel
    from tnco_tpu.parallel.replicas import ReplicaRunnerFW
    from tnco_tpu.testing.utils import is_valid_contraction_tree

    ts_inds, output_inds, dims = generate_random_tensors(rng,
                                                         n_tensors=8,
                                                         n_output_inds=1)
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
    runner = ReplicaRunnerFW(ctrees, list(range(8)),
                             cmodel=SimpleCostModel(max_width=3.0),
                             engine='batched')
    runner.run(np.linspace(0, 8, 32), chunk_size=8, update_slices=8,
               exchange_every=2)
    for i in range(0, 8, 3):
        is_valid_contraction_tree(runner.ctree(i), ts_inds, output_inds,
                                  dims)
        is_valid_contraction_tree(runner.min_ctree(i), ts_inds,
                                  output_inds, dims)


def test_walker_exchange_and_accessors(rng, random_seed):
    """Walker engine: exchange between chunks + lane-major accessors.

    Regression: min_ctree/ctree/slices_lanes used to treat 'walker' as
    replica-major and crashed on its SABatch state; exchange_every was
    refused outright.
    """
    import math

    from tnco_tpu.testing.utils import is_valid_contraction_tree

    ts_inds, output_inds, dims = generate_random_tensors(rng,
                                                         n_tensors=10,
                                                         n_output_inds=1)
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
                           cmodel=SimpleCostModel(), engine='walker',
                           n_walks=4)
    out = runner.run(np.linspace(0, 10, 32), chunk_size=8,
                     exchange_every=2)
    assert out['moves'] == 32 * 4 * 8
    best_i, best = runner.best()
    is_valid_contraction_tree(runner.min_ctree(best_i), ts_inds,
                              output_inds, dims)
    assert best == pytest.approx(
        math.log2(runner.min_ctree(best_i).total_cost_exact()), abs=1e-3)
    for i in range(0, 8, 3):
        is_valid_contraction_tree(runner.ctree(i), ts_inds, output_inds,
                                  dims)


def test_auto_routing(monkeypatch):
    """'auto' routes large networks to the device walk engines when an
    accelerator is present (the quality winners: walker for IM, walks
    at P=128 for FW per the round-4 repeated-cell matrix —
    docs/QUALITY.md), and to the native CPU engine otherwise."""
    from tnco_tpu import native
    from tnco_tpu.optimize.finite_width import (SimpleCostModel as
                                                SimpleCostModelFW)
    from tnco_tpu.parallel import replicas
    from tnco_tpu.parallel.replicas import ReplicaRunnerFW

    # 900-tensor chain: N*W = 1799 * 29 > 32768 words => "large".
    n_t = 900
    ts_inds = [(i, i + 1) for i in range(n_t)]
    output_inds = (0, n_t)
    dims = {i: 2 for i in range(n_t + 1)}
    # Sequential left fold: contract (0,1), then result with next, ...
    path = [(0, 1)] * (n_t - 1)
    ctree = ContractionTree(path, ts_inds, dims, output_inds=output_inds)
    assert len(ctree) * ctree.inds_array.shape[1] > 32768

    monkeypatch.setattr(replicas, '_accel_available', lambda: True)
    r = ReplicaRunner([ctree], [0], cmodel=SimpleCostModel())
    assert r.engine == 'walker'
    assert r.n_walks == 8
    rfw = ReplicaRunnerFW([ctree], [0],
                          cmodel=SimpleCostModelFW(max_width=30))
    assert rfw.engine == 'walks'
    assert rfw.n_walks == 128  # round-4 FW operating point

    monkeypatch.setattr(replicas, '_accel_available', lambda: False)
    if native.available():
        r = ReplicaRunner([ctree], [0], cmodel=SimpleCostModel())
        assert r.engine == 'native'

    # Small networks stay on the lane-major batched engine either way.
    monkeypatch.setattr(replicas, '_accel_available', lambda: True)
    small_inds = [(0, 1), (1, 2), (2, 3)]
    small_path = [(0, 1), (0, 1)]
    small = ContractionTree(small_path, small_inds, {i: 2 for i in range(4)},
                            output_inds=(0, 3))
    r = ReplicaRunner([small], [0], cmodel=SimpleCostModel())
    assert r.engine == 'batched'


def test_meshless_engines_guarded(monkeypatch):
    """Engines without a sharded path refuse a mesh, and 'auto' + mesh
    never selects one (VERDICT r3 item 2: walker+mesh used to shard the
    batch and then hit Mosaic custom calls under plain jit — walker now
    has a shard_map path, so only 'sweep' remains meshless)."""
    from tnco_tpu.optimize.finite_width import (SimpleCostModel as
                                                SimpleCostModelFW)
    from tnco_tpu.parallel import replicas
    from tnco_tpu.parallel.replicas import ReplicaRunnerFW

    n_t = 900
    ts_inds = [(i, i + 1) for i in range(n_t)]
    output_inds = (0, n_t)
    dims = {i: 2 for i in range(n_t + 1)}
    path = [(0, 1)] * (n_t - 1)
    trees = [ContractionTree(path, ts_inds, dims,
                             output_inds=output_inds) for _ in range(8)]
    mesh = make_mesh(jax.devices()[:8])

    monkeypatch.setattr(replicas, '_accel_available', lambda: True)
    # 'auto' + mesh keeps the large IM network on the device IM winner
    # (walker), now through its shard_map path.
    r = ReplicaRunner(trees, list(range(8)), cmodel=SimpleCostModel(),
                      mesh=mesh)
    assert r.engine == 'walker'

    for engine in replicas._MESHLESS:
        with pytest.raises(ValueError, match='multi-chip'):
            ReplicaRunner(trees, list(range(8)),
                          cmodel=SimpleCostModel(), mesh=mesh,
                          engine=engine)
        with pytest.raises(ValueError, match='multi-chip'):
            ReplicaRunnerFW(trees, list(range(8)),
                            cmodel=SimpleCostModelFW(max_width=30),
                            mesh=mesh, engine=engine)
