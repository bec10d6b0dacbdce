"""cirq/qiskit adapter tests with duck-typed fakes.

The image ships neither cirq nor qiskit, so the adapters are exercised
against minimal fake modules/objects that implement exactly the data
model the adapters consume (mirroring the reference's qiskit loader
test, /root/reference/tests/test_circuit.py:360-391): a fake ``cirq``
module providing ``is_measurement``/``unitary`` and a circuit class
whose ``__module__``/name match the real ones (that is what
``app.load_tn``'s dispatch keys on, tnco_tpu/app/app.py:272-278).
"""

import sys
import types

import numpy as np
import pytest

from tnco_tpu.utils.circuit import cirq_to_gates, qiskit_to_gates

_H = np.array([[1.0, 1.0], [1.0, -1.0]]) / np.sqrt(2.0)
_CNOT = np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 0, 1.0],
                  [0, 0, 1.0, 0]])
_T = np.diag([1.0, np.exp(1j * np.pi / 4)])


class _FakeOp:
    def __init__(self, unitary, qubits, meas=False):
        self._u = unitary
        self.qubits = tuple(qubits)
        self._meas = meas


@pytest.fixture
def fake_cirq(monkeypatch):
    mod = types.ModuleType('cirq')
    mod.is_measurement = lambda op: op._meas
    mod.unitary = lambda op: op._u
    monkeypatch.setitem(sys.modules, 'cirq', mod)
    return mod


def _fake_cirq_circuit(ops):
    cls = type(
        'Circuit', (),
        {'all_operations': lambda self: iter(self._ops)})
    cls.__module__ = 'cirq.circuits.circuit'
    circuit = cls()
    circuit._ops = list(ops)
    return circuit


def test_cirq_to_gates(fake_cirq):
    ops = [
        _FakeOp(_H, ('q0',)),
        _FakeOp(_CNOT, ('q0', 'q1')),
        _FakeOp(np.eye(2), ('q1',), meas=True),  # measurement: skipped
        _FakeOp(_T, ('q1',)),
    ]
    gates = cirq_to_gates(_fake_cirq_circuit(ops))
    assert len(gates) == 3
    np.testing.assert_allclose(gates[0][0], _H)
    assert gates[0][1] == ('q0',)
    np.testing.assert_allclose(gates[1][0], _CNOT)
    assert gates[1][1] == ('q0', 'q1')
    np.testing.assert_allclose(gates[2][0], _T)


def test_cirq_load_tn_end_to_end(fake_cirq):
    """A fake cirq Circuit loads into the same TN as the raw gate list."""
    from tnco_tpu.app import load_tn

    ops = [_FakeOp(_H, ('q0',)), _FakeOp(_CNOT, ('q0', 'q1'))]
    circuit = _fake_cirq_circuit(ops)
    gates = [(_H, ('q0',)), (_CNOT, ('q0', 'q1'))]

    tn_circuit = load_tn(circuit, fuse=0, seed=3)
    tn_gates = load_tn(gates, fuse=0, seed=3)
    assert len(tn_circuit.tensors) == len(tn_gates.tensors)
    assert tn_circuit.output_inds == tn_gates.output_inds
    for a, b in zip(tn_circuit.tensors, tn_gates.tensors):
        assert a.inds == b.inds
        np.testing.assert_allclose(np.asarray(a.array),
                                   np.asarray(b.array))


class _FakeQiskitOp:
    def __init__(self, name, matrix):
        self.name = name
        self._m = matrix

    def to_matrix(self):
        return self._m


class _FakeInstr:
    def __init__(self, op, qubits):
        self.operation = op
        self.qubits = tuple(qubits)


@pytest.fixture
def fake_qiskit(monkeypatch):
    monkeypatch.setitem(sys.modules, 'qiskit',
                        types.ModuleType('qiskit'))


def _fake_qiskit_circuit(instrs):
    cls = type('QuantumCircuit', (),
               {'__iter__': lambda self: iter(self._instrs)})
    cls.__module__ = 'qiskit.circuit.quantumcircuit'
    circuit = cls()
    circuit._instrs = list(instrs)
    return circuit


def test_qiskit_to_gates(fake_qiskit):
    instrs = [
        _FakeInstr(_FakeQiskitOp('h', _H), (0,)),
        _FakeInstr(_FakeQiskitOp('measure', None), (0,)),
        _FakeInstr(_FakeQiskitOp('barrier', None), (0, 1)),
        _FakeInstr(_FakeQiskitOp('cx', _CNOT), (0, 1)),
    ]
    gates = qiskit_to_gates(_fake_qiskit_circuit(instrs))
    assert len(gates) == 2
    np.testing.assert_allclose(gates[0][0], _H)
    assert gates[0][1] == (0,)
    np.testing.assert_allclose(gates[1][0], _CNOT)
    assert gates[1][1] == (0, 1)


def test_qiskit_load_tn_end_to_end(fake_qiskit):
    from tnco_tpu.app import load_tn

    instrs = [
        _FakeInstr(_FakeQiskitOp('h', _H), (0,)),
        _FakeInstr(_FakeQiskitOp('cx', _CNOT), (0, 1)),
    ]
    circuit = _fake_qiskit_circuit(instrs)
    gates = [(_H, (0,)), (_CNOT, (0, 1))]

    tn_circuit = load_tn(circuit, fuse=0, seed=3)
    tn_gates = load_tn(gates, fuse=0, seed=3)
    assert len(tn_circuit.tensors) == len(tn_gates.tensors)
    assert tn_circuit.output_inds == tn_gates.output_inds
    for a, b in zip(tn_circuit.tensors, tn_gates.tensors):
        assert a.inds == b.inds
        np.testing.assert_allclose(np.asarray(a.array),
                                   np.asarray(b.array))
