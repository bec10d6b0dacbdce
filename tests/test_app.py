"""App-layer tests: load_tn formats, end-to-end optimize (README slice),
dump_results (parity with reference tests/test_app.py:118-330)."""

import gzip
import json
from decimal import Decimal

import numpy as np
import pytest

from tnco_tpu.app import (dump_results, load_tn, Optimizer, Tensor,
                          TensorNetwork)
from tnco_tpu.utils.tn import contract

README_TN = """
2 a b
2 b c
2 c d
"""


def test_tensor_model():
    t = Tensor(array=np.eye(2), inds=('i', 'j'))
    assert t.ndim == 2 and t.dims == (2, 2)
    t2 = Tensor(inds=('i', 'j', 'k'), dims=2)
    assert t2.dims == (2, 2, 2)
    with pytest.raises(ValueError):
        Tensor(inds=('i',))
    with pytest.raises(ValueError):
        Tensor(inds=('i',), dims=(2, 2))
    with pytest.raises(ValueError):
        Tensor(inds=('i', 'j'), dims=(2, 3), array=np.eye(2))
    json.loads(t.to_json())


def test_tensor_network_model():
    t1 = Tensor(array=np.eye(2), inds=('i', 'j'))
    t2 = Tensor(array=np.ones(2), inds=('j',))
    tn = TensorNetwork([t1, t2])
    assert tn.n_tensors == 2
    assert tn.output_inds == frozenset({'i'})
    assert dict(tn.dims) == {'i': 2, 'j': 2}
    # Hyper-indices require explicit outputs
    with pytest.raises(ValueError):
        TensorNetwork([
            Tensor(inds=('i',), dims=(2,)),
            Tensor(inds=('i',), dims=(2,)),
            Tensor(inds=('i',), dims=(2,)),
        ])
    tn2 = TensorNetwork([
        Tensor(inds=('i',), dims=(2,)),
        Tensor(inds=('i',), dims=(2,)),
        Tensor(inds=('i',), dims=(2,)),
    ], output_inds=())
    assert tn2.output_inds == frozenset()
    json.loads(tn.to_json())


def test_load_tn_string_and_list():
    # Index-map format: each row is (dim, tensor_name, tensor_name, ...);
    # the README TN is a 4-tensor chain a-b-c-d with int index labels.
    tn = load_tn(README_TN)
    assert isinstance(tn, TensorNetwork)
    tn = load_tn(README_TN, fuse=False)
    assert tn.n_tensors == 4
    assert tn.output_inds == frozenset()
    assert dict(tn.dims) == {0: 2, 1: 2, 2: 2}

    tn2 = load_tn([[2, 'i', 'j'], [2, 'j', 'k']], fuse=False)
    assert tn2.n_tensors == 3
    assert tn2.output_inds == frozenset()

    # Output / sparse tokens mark index labels (row numbers here)
    tn3 = load_tn([[2, 'i', 'j'], [2, 'j', 'k'], [2, 'k', '*'],
                   [4, 'j', '/']], fuse=False, decompose_hyper_inds=False)
    assert tn3.output_inds == frozenset({2})
    assert tn3.sparse_inds == frozenset({3})


def test_load_tn_file_and_json(tmp_path):
    p = tmp_path / 'tn.txt'
    p.write_text(README_TN)
    tn = load_tn(str(p), fuse=False)
    assert tn.n_tensors == 4

    pgz = tmp_path / 'tn.gz'
    pgz.write_bytes(gzip.compress(README_TN.encode()))
    tn = load_tn(str(pgz), fuse=False)
    assert tn.n_tensors == 4

    tn2 = load_tn(json.dumps([[2, 'i', 'j'], [2, 'j', 'k']]), fuse=False)
    assert tn2.n_tensors == 3

    with pytest.raises(TypeError):
        load_tn(3.14)


def test_load_tn_decompose_hyper():
    # A diagonal matrix decomposes into a hyper index connecting its legs
    diag = np.diag([1.0, 2.0])
    tn = TensorNetwork([
        Tensor(array=diag, inds=('i', 'j')),
        Tensor(array=np.ones(2), inds=('i',)),
        Tensor(array=np.ones(2), inds=('j',)),
    ], output_inds=())
    out = load_tn(tn, fuse=False)
    assert 'hyper_inds_map' in out.tags
    # i and j merged into one label
    labels = set()
    for t in out.tensors:
        labels.update(t.inds)
    assert len(labels) == 1


def test_load_tn_fuse_preserves_value(rng):
    # Random small chain with arrays: fusing must preserve the full
    # contraction value.
    arrays = [np.asarray(rng.choices(range(1, 5), k=4),
                         dtype=np.float64).reshape(2, 2) for _ in range(4)]
    ts_inds = [('a', 'b'), ('b', 'c'), ('c', 'd'), ('d', 'e')]
    tn = TensorNetwork(
        [Tensor(xs, array=a) for xs, a in zip(ts_inds, arrays)])

    def full_value(tn):
        _, _, arrs = contract([(0, 1)] * (tn.n_tensors - 1),
                              tn.ts_inds,
                              tn.output_inds,
                              arrays=tn.arrays)
        return np.asarray(arrs[0])

    want = full_value(tn)
    fused = load_tn(tn, fuse=2.0, decompose_hyper_inds=False, seed=3)
    assert 'fuse_path' in fused.tags
    got = full_value(fused)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_optimize_readme_end_to_end():
    # The README example (reference README.md:90-100): 4-index chain,
    # betas=(0, 100), n_steps=100, n_runs=8.
    # With the default fuse=4 the whole chain legitimately collapses to a
    # scalar during loading (cost 0); disable fusion to exercise the SA.
    opt = Optimizer(method='sa', seed=42)
    tn0, res0 = opt.optimize(README_TN, betas=(0, 100), n_steps=100,
                             n_runs=2)
    assert int(res0[0].cost) == 0 and tn0.n_tensors == 1

    opt = Optimizer(method='sa', seed=42)
    tn, res = opt.optimize(README_TN, betas=(0, 100), n_steps=100,
                           n_runs=8, fuse=False)
    assert isinstance(tn, TensorNetwork)
    assert len(res) == 8
    # Results sorted by cost
    costs = [r.cost for r in res]
    assert costs == sorted(costs)
    # Known optimum for the 4-tensor chain a(x) b(x,y) c(y,z) d(z):
    # sweep left-to-right: 4 + 4 + 2 = 10 ops.
    assert int(res[0].cost) == 10
    # Path must replay to a single tensor
    ts_inds, _ = contract(res[0].path, tn.ts_inds, tn.output_inds,
                          dims=dict(tn.dims))
    assert len(ts_inds) == 1
    json.loads(res[0].to_json())


def test_optimize_engine_n_walks_end_to_end():
    """engine/n_walks knobs reach the replica runner through the app."""
    opt = Optimizer(method='sa', seed=42, engine='multiwalk', n_walks=4)
    assert opt.engine == 'multiwalk' and opt.n_walks == 4
    tn, res = opt.optimize(README_TN, betas=(0, 50), n_steps=60,
                           n_runs=4, fuse=False)
    assert int(res[0].cost) == 10

    opt = Optimizer(method='sa', seed=42, engine='walks', n_walks=4)
    tn, res = opt.optimize(README_TN, betas=(0, 50), n_steps=60,
                           n_runs=4, fuse=False)
    assert int(res[0].cost) == 10


def test_optimize_json_output_and_determinism():
    opt1 = Optimizer(method='sa', seed=7, output_format='json')
    out1 = opt1.optimize(README_TN, betas=(0, 50), n_steps=50, n_runs=3)
    opt2 = Optimizer(method='sa', seed=7, output_format='json')
    out2 = opt2.optimize(README_TN, betas=(0, 50), n_steps=50, n_runs=3)
    d1, d2 = json.loads(out1), json.loads(out2)
    # Determinism: identical modulo runtime (reference
    # tests/test_determinism.sh:26-45)
    for r in (*d1['res'], *d2['res']):
        r.pop('runtime_s')
    assert d1 == d2


def test_optimize_disconnected_components():
    tn = """
2 a b
2 b c
2 x y
2 y z
"""
    opt = Optimizer(method='sa', seed=1)
    tn_out, res = opt.optimize(tn, betas=(0, 20), n_steps=20, n_runs=2,
                               fuse=False)
    best = res[0]
    assert len(best.disconnected_paths) == 2
    assert int(best.cost) == sum(int(c) for c in best.disconnected_costs)
    # Merged path contracts everything to one tensor
    ts_inds, _ = contract(best.path, tn_out.ts_inds, tn_out.output_inds,
                          dims=dict(tn_out.dims))
    assert len(ts_inds) == 1


def test_dump_results(tmp_path):
    tn = load_tn(README_TN, fuse=False)
    from tnco_tpu.app.infinite_memory.sa import ContractionResults
    res = [
        ContractionResults(cost=Decimal(16), runtime_s=0.1,
                           path=[(0, 1), (0, 1)],
                           disconnected_costs=[Decimal(16)],
                           disconnected_paths=[[(0, 1), (0, 1)]])
    ]
    # Raw passthrough
    out = dump_results(tn, res)
    assert out == (tn, res)
    # JSON string
    out = dump_results(tn, res, output_format='json')
    json.loads(out)
    # File with gzip compression + overwrite guard
    p = tmp_path / 'out.gzip'
    dump_results(tn, res, output_format='json', output_filename=str(p))
    with pytest.raises(FileExistsError):
        dump_results(tn, res, output_format='json', output_filename=str(p))
    dump_results(tn, res, output_format='json', output_filename=str(p),
                 overwrite_output_file=True)
    json.loads(gzip.decompress(p.read_bytes()))
    with pytest.raises(ValueError):
        dump_results(tn, res, output_format='yaml')


def test_cli_readme(tmp_path, capsys):
    from tnco_tpu.app.cli import main
    rc = main([
        'optimize', '[(2, "a", "b"), (2, "b", "c"), (2, "c", "d")]',
        '--betas=(0, 100)', '--n-steps=50', '--n-runs=2', '--seed=3',
        '--fuse=False'
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert 'tn' in out and 'res' in out
    assert int(Decimal(out['res'][0]['cost'])) == 10


def test_optimize_finite_width_end_to_end():
    # 2D 3x3 lattice, bond dim 2, width cap 2 -> slices must appear.
    rows = []
    idx = 0
    names = {(r, c): f't{r}{c}' for r in range(3) for c in range(3)}
    for r in range(3):
        for c in range(3):
            if c + 1 < 3:
                rows.append((2, names[(r, c)], names[(r, c + 1)]))
            if r + 1 < 3:
                rows.append((2, names[(r, c)], names[(r + 1, c)]))
    opt = Optimizer(method='sa', max_width=2.0, seed=11)
    tn, res = opt.optimize(rows, betas=(0, 30), n_steps=40, n_runs=4,
                           update_slices=5, fuse=False)
    best = res[0]
    assert hasattr(best, 'slices')
    costs = [r.cost for r in res]
    assert costs == sorted(costs)
    # Path replays to a single tensor
    ts_inds, _ = contract(best.path, tn.ts_inds, tn.output_inds,
                          dims=dict(tn.dims))
    assert len(ts_inds) == 1
    json.loads(best.to_json())
    # Every tensor along the best path fits max_width after slicing
    from tnco_tpu.ctree import ContractionTree as CT
    ctree = CT(best.path, tn.ts_inds, dict(tn.dims),
               output_inds=tn.output_inds)
    import math
    dims = dict(tn.dims)
    for xs in ctree.inds:
        w = sum(math.log2(dims[x]) for x in frozenset(xs) - best.slices)
        assert w <= 2.0 + 1e-3


def test_cli_determinism_across_hashseeds(tmp_path):
    # Reference tests/test_determinism.sh:16-45: same --seed, different
    # PYTHONHASHSEED -> identical JSON modulo runtime.
    import os
    import subprocess
    import sys

    outs = []
    for hashseed in ('1', '4242'):
        env = dict(os.environ)
        env['PYTHONHASHSEED'] = hashseed
        env['TNCO_TPU_PLATFORM'] = 'cpu'
        proc = subprocess.run(
            [sys.executable, '-m', 'tnco_tpu.app.cli', 'optimize',
             '2 a b\n2 b c\n2 c d', '--betas=(0, 30)', '--n-steps=30',
             '--n-runs=2', '--seed=11', '--fuse=False'],
            capture_output=True, text=True, env=env, timeout=300)
        assert proc.returncode == 0, proc.stderr
        outs.append(json.loads(proc.stdout))
    for out in outs:
        for r in out['res']:
            r.pop('runtime_s')
    assert outs[0] == outs[1]


def test_cli_sample(capsys):
    from tnco_tpu.app.cli import main
    rc = main([
        'sample', 'OPENQASM 2.0; qreg q[2]; h q[0]; cx q[0], q[1];',
        '--n-samples=40', '--seed=5', '--fuse=False',
        '--decompose-hyper-inds=False', '--betas=(0, 30)', '--n-steps=30'
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert set(out['hits']) <= {'00', '11'}
    assert abs(sum(out['hits'].values()) - 1.0) < 1e-9
