"""BGL sampler tests (parity with reference tests/test_app.py:333-402):
peaked circuits sample their peak; Bell-pair statistics within ~1/sqrt(N)."""

import math
import pickle

import numpy as np
import pytest

from tnco_tpu.app.circuit import Sampler
from tnco_tpu.app.circuit.sampling import is_classical_operation

H = np.array([[1, 1], [1, -1]]) / math.sqrt(2)
X = np.array([[0, 1], [1, 0]])
CX = np.eye(4)[[0, 1, 3, 2]]
OPTIMIZE = dict(betas=(0, 20), n_steps=20, n_runs=1)


def test_is_classical_operation():
    assert is_classical_operation(X)
    assert is_classical_operation(CX)
    assert is_classical_operation(1j * X)
    assert not is_classical_operation(H)


def test_sampler_peaked_deterministic():
    # |q0 q1> = X|0> ⊗ H H |0> = |1 0> : the sample is the peak, always.
    circuit = [(X, (0,)), (H, (1,)), (H, (1,))]
    sampler = Sampler(seed=5)
    hits, qubits = sampler.sample(circuit, n_samples=20, simplify=False,
                                  fuse=False, decompose_hyper_inds=False,
                                  qubit_order=(0, 1), **OPTIMIZE)
    assert hits == {'10': 1.0}
    assert qubits == (0, 1)


def test_sampler_bell_statistics():
    # H then CX (classical permutation): Bell pair, ~50/50 over 00/11.
    circuit = [(H, (0,)), (CX, (0, 1))]
    sampler = Sampler(seed=17)
    n = 400
    hits, _ = sampler.sample(circuit, n_samples=n, fuse=False,
                             decompose_hyper_inds=False, simplify=False,
                             qubit_order=(0, 1), normalize=False,
                             **OPTIMIZE)
    assert set(hits) <= {'00', '11'}
    assert sum(hits.values()) == n
    assert abs(hits.get('00', 0) / n - 0.5) < 5 / math.sqrt(n)


def test_sampler_intermediate_state_roundtrip():
    circuit = [(H, (0,)), (X, (1,))]
    sampler = Sampler(seed=3)
    state = sampler.sample(circuit, n_samples=1, fuse=False,
                           simplify=False, decompose_hyper_inds=False,
                           return_intermediate_state_only=True, **OPTIMIZE)
    state2 = pickle.loads(pickle.dumps(state))
    hits, _ = sampler.sample(state2, n_samples=50, qubit_order=(0, 1),
                             **OPTIMIZE)
    # qubit 1 is always flipped by the classical X
    assert all(b[1] == '1' for b in hits)
    assert abs(sum(v for b, v in hits.items() if b[0] == '0') - 0.5) < 0.3


def test_sampler_rejects_multiqubit_nonclassical():
    # CZ counts as classical (a permutation with phases); H x I does not.
    assert is_classical_operation(np.diag([1, 1, 1, -1]))
    hx = np.kron(H, np.eye(2))
    assert not is_classical_operation(hx)
    sampler = Sampler(seed=1)
    with pytest.raises(ValueError):
        sampler.sample([(hx, (0, 1))], n_samples=1, **OPTIMIZE)


def test_sampler_finite_width():
    # BEYOND REFERENCE (it raises NotImplementedError here,
    # tnco/app/circuit/sampling.py:479-481): finite max_width runs the
    # width-capped optimizer and executes the sliced amplitude networks
    # via utils.tn.contract_sliced.  A tight cap forces nonempty slice
    # sets, and the peaked circuit must still sample its peak exactly.
    circuit = [(X, (0,)), (H, (1,)), (H, (1,))]
    sampler = Sampler(max_width=1.0, seed=5)
    state = sampler.sample(circuit, n_samples=1, simplify=False,
                           fuse=False, decompose_hyper_inds=False,
                           return_intermediate_state_only=True, **OPTIMIZE)
    assert any(res is not None and res.slices
               for _, res, *_ in state), 'cap never forced a slice'
    hits, qubits = sampler.sample(state, n_samples=20,
                                  qubit_order=(0, 1), **OPTIMIZE)
    assert hits == {'10': 1.0}
    assert qubits == (0, 1)
