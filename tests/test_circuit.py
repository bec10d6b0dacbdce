"""Circuit-layer tests vs dense linear algebra (parity with reference
tests/test_circuit.py): commute/same, load with states, simplification,
hyper decomposition, QASM parsing."""

import math

import numpy as np
import pytest

from tnco_tpu.utils.circuit import commute, load, same
from tnco_tpu.utils.qasm import parse_qasm
from tnco_tpu.utils.tn import contract

X = np.array([[0, 1], [1, 0]], dtype=complex)
Y = np.array([[0, -1j], [1j, 0]])
Z = np.diag([1, -1]).astype(complex)
H = np.array([[1, 1], [1, -1]], dtype=complex) / math.sqrt(2)
S = np.diag([1, 1j])
CX = np.eye(4, dtype=complex)[[0, 1, 3, 2]]
CZ = np.diag([1, 1, 1, -1]).astype(complex)


def dense_state(circuit, qubits, initial='0'):
    """Dense reference simulator: applies gates to |initial...>."""
    qubits = list(qubits)
    n = len(qubits)
    state = np.zeros(2**n, dtype=complex)
    state[0] = 1.0
    state = state.reshape((2,) * n)
    for matrix, qs in circuit:
        axes = [qubits.index(q) for q in qs]
        k = len(axes)
        u = np.asarray(matrix, dtype=complex).reshape((2,) * 2 * k)
        state = np.tensordot(u, state, axes=(range(k, 2 * k), axes))
        # tensordot puts the new axes first; restore order
        rest = [a for a in range(n) if a not in axes]
        perm = np.argsort(axes + rest)
        state = state.transpose(perm)
    return state.reshape(-1)


def tn_state(circuit, qubits, **load_kwargs):
    """Contracts the TN from load() into a dense final-state vector."""
    arrays, ts_inds, output_inds = load(circuit, initial_state='0',
                                        final_state=None, **load_kwargs)
    ts_inds, out, arrays = contract([(0, 1)] * (len(ts_inds) - 1), ts_inds,
                                    output_inds, arrays)
    (zs,), (arr,) = ts_inds, arrays
    # Reorder legs to sorted-qubit order (q, 'f')
    want = [(q, 'f') for q in qubits]
    arr = np.asarray(arr)
    if arr.ndim:
        arr = arr.transpose([zs.index(x) for x in want])
    return arr.reshape(-1)


def test_commute():
    assert not commute((X, (0,)), (Z, (0,)))
    assert commute((X, (0,)), (X, (0,)))
    assert commute((X, (0,)), (Z, (1,)))  # disjoint qubits
    assert commute((Z, (0,)), (CZ, (0, 1)))  # diagonal gates commute
    assert not commute((X, (0,)), (CZ, (0, 1)))
    # CX control commutes with Z on control
    assert commute((Z, (0,)), (CX, (0, 1)))
    assert not commute((Z, (1,)), (CX, (0, 1)))
    # Qubit-overlap-only mode
    assert not commute((Z, (0,)), (CZ, (0, 1)),
                       use_matrix_commutation=False)


def test_same():
    assert same((X, (0,)), (X, (0,)))
    assert same((X, (0,)), (1j * X, (0,)))  # global phase
    assert not same((X, (0,)), (Z, (0,)))
    assert not same((X, (0,)), (X, (1,)))
    # Qubit permutation of a symmetric gate
    assert same((CZ, (0, 1)), (CZ, (1, 0)))
    swapped = CX.reshape(2, 2, 2, 2).transpose(1, 0, 3, 2).reshape(4, 4)
    assert same((CX, (0, 1)), (swapped, (1, 0)))


@pytest.mark.parametrize('decompose', [False, True])
@pytest.mark.parametrize('fuse', [False, 3])
def test_load_matches_dense(decompose, fuse, rng):
    qubits = [0, 1, 2]
    circuit = [
        (H, (0,)),
        (CX, (0, 1)),
        (S, (1,)),
        (CZ, (1, 2)),
        (H, (2,)),
        (Y, (0,)),
    ]
    want = dense_state(circuit, qubits)
    got = tn_state(circuit, qubits, simplify=False,
                   decompose_hyper_inds=decompose, fuse=fuse)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_load_simplify_cancels_inverse_pairs():
    # C followed by C^-1 (through commuting gates) cancels completely;
    # idle qubits get identities.
    circuit = [
        (H, (0,)),
        (Z, (1,)),  # commutes with CZ
        (CZ, (0, 1)),
        (CZ, (0, 1)),
        (Z, (1,)),
        (H, (0,)),
    ]
    arrays, ts_inds, output_inds = load(circuit, initial_state=None,
                                        final_state=None, simplify=True,
                                        decompose_hyper_inds=False,
                                        fuse=False)
    # Everything cancels -> two identity tensors remain (one per qubit)
    assert len(arrays) == 2
    for a in arrays:
        np.testing.assert_allclose(np.asarray(a), np.eye(2), atol=1e-12)


def test_load_simplify_preserves_state(rng):
    qubits = [0, 1]
    circuit = [
        (H, (0,)),
        (CX, (0, 1)),
        (X, (1,)),
        (X, (1,)),  # cancels
        (Z, (0,)),
    ]
    want = dense_state(circuit, qubits)
    got = tn_state(circuit, qubits, simplify=True,
                   decompose_hyper_inds=False, fuse=False)
    # Global phase may differ after cancellation; compare projectively
    overlap = abs(np.vdot(want, got))
    np.testing.assert_allclose(overlap, np.linalg.norm(want) *
                               np.linalg.norm(got), atol=1e-10)


def test_load_initial_final_states():
    # <0| H |0> = 1/sqrt(2)
    arrays, ts_inds, output_inds = load([(H, (0,))], initial_state='0',
                                        final_state='0',
                                        decompose_hyper_inds=False,
                                        fuse=False)
    assert output_inds == frozenset()
    _, _, out = contract([(0, 1)] * (len(ts_inds) - 1), ts_inds, (),
                         arrays)
    assert complex(np.asarray(out[0])) == pytest.approx(1 / math.sqrt(2))

    # dict states + vector states: <0| H |+> = 1
    arrays, ts_inds, output_inds = load(
        [(H, (0,))], initial_state={0: '+'},
        final_state={0: np.array([1, 0])},
        decompose_hyper_inds=False, fuse=False)
    _, _, out = contract([(0, 1)] * (len(ts_inds) - 1), ts_inds, (),
                         arrays)
    assert complex(np.asarray(out[0])) == pytest.approx(1.0)

    with pytest.raises(ValueError):
        load([(H, (0,))], initial_state='x', final_state=None)


def test_load_open_ends():
    arrays, ts_inds, output_inds = load([(H, (0,))], initial_state=None,
                                        final_state=None, fuse=False,
                                        decompose_hyper_inds=False)
    assert output_inds == {(0, 'i'), (0, 'f')}


def test_load_hyper_decomposition_diagonal_gates():
    # CZ is diagonal: decomposition should turn its legs into hyper
    # indices, preserving the state.
    qubits = [0, 1]
    circuit = [(H, (0,)), (H, (1,)), (CZ, (0, 1)), (X, (0,))]
    want = dense_state(circuit, qubits)
    got = tn_state(circuit, qubits, simplify=False,
                   decompose_hyper_inds=True, fuse=False)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_qasm_bell():
    qasm = """
    OPENQASM 2.0;
    include "qelib1.inc";
    qreg q[2];
    creg c[2];
    h q[0];
    cx q[0], q[1];
    measure q[0] -> c[0];
    """
    gates = parse_qasm(qasm)
    assert len(gates) == 2
    qubits = [('q', 0), ('q', 1)]
    want = dense_state(gates, qubits)
    np.testing.assert_allclose(
        np.abs(want)**2, [0.5, 0, 0, 0.5], atol=1e-12)

    # Through load_tn
    from tnco_tpu.app import load_tn
    tn = load_tn(qasm, fuse=False, decompose_hyper_inds=False,
                 initial_state='0', final_state=None)
    assert tn.n_tensors >= 2


def test_qasm_parametrized():
    gates = parse_qasm("""
    OPENQASM 2.0;
    qreg q[1];
    rx(pi/2) q[0];
    u3(pi/2, 0, pi) q[0];
    """)
    assert len(gates) == 2
    # u3(pi/2, 0, pi) == H
    np.testing.assert_allclose(gates[1][0], H, atol=1e-12)
