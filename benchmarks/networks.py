"""Benchmark tensor networks (BASELINE.md configs 1-5).

1. 4-tensor chain (README example)
2. 2D square lattice 8x8, bond dim 2
3. Random 3-regular graph, 150 tensors, bond dim 2
4. QAOA circuit TN (width-capped optimization)
5. Sycamore-53-like m=20 random circuit TN (pod-scale target)

Each builder returns ``(ts_inds, output_inds, dims)`` ready for
``ContractionTree`` / the replica runners.
"""

import itertools as its
import math
from random import Random

import numpy as np

__all__ = ['chain', 'lattice_2d', 'random_regular', 'qaoa_tn',
           'sycamore_like_tn']


def chain(n_tensors: int = 4, dim: int = 2):
    """1D chain: t0 - t1 - ... (README example topology)."""
    ts_inds = []
    for t in range(n_tensors):
        inds = []
        if t > 0:
            inds.append(f'b{t - 1}')
        if t + 1 < n_tensors:
            inds.append(f'b{t}')
        ts_inds.append(tuple(inds))
    dims = {f'b{t}': dim for t in range(n_tensors - 1)}
    return ts_inds, frozenset(), dims


def lattice_2d(rows: int = 8, cols: int = 8, dim: int = 2):
    """2D square-lattice TN (open boundary)."""
    ts_inds = [[] for _ in range(rows * cols)]
    dims = {}

    def tid(r, c):
        return r * cols + c

    for r in range(rows):
        for c in range(cols):
            if c + 1 < cols:
                x = f'h{r}_{c}'
                ts_inds[tid(r, c)].append(x)
                ts_inds[tid(r, c + 1)].append(x)
                dims[x] = dim
            if r + 1 < rows:
                x = f'v{r}_{c}'
                ts_inds[tid(r, c)].append(x)
                ts_inds[tid(r + 1, c)].append(x)
                dims[x] = dim
    return [tuple(xs) for xs in ts_inds], frozenset(), dims


def random_regular(n_tensors: int = 150, degree: int = 3, dim: int = 2,
                   seed: int = 0):
    """Random d-regular graph TN via configuration model with retries."""
    rng = Random(seed)
    if n_tensors * degree % 2:
        raise ValueError("n * degree must be even.")
    for _ in range(1000):
        stubs = [t for t in range(n_tensors) for _ in range(degree)]
        rng.shuffle(stubs)
        edges = list(zip(stubs[::2], stubs[1::2]))
        if any(a == b for a, b in edges):
            continue
        if len({tuple(sorted(e)) for e in edges}) != len(edges):
            continue
        break
    else:
        raise RuntimeError("Failed to build a simple regular graph.")
    ts_inds = [[] for _ in range(n_tensors)]
    dims = {}
    for i, (a, b) in enumerate(edges):
        x = f'e{i}'
        ts_inds[a].append(x)
        ts_inds[b].append(x)
        dims[x] = dim
    return [tuple(xs) for xs in ts_inds], frozenset(), dims


def _grid_qubits_53():
    """53 qubits on a Sycamore-like diagonal grid."""
    qubits = []
    rows = [6, 6, 6, 6, 6, 6, 6, 6, 5]
    for r, n in enumerate(rows):
        for c in range(n):
            qubits.append((r, c))
    return qubits[:53]


def qaoa_circuit(n_qubits: int = 26, p_layers: int = 4, seed: int = 0):
    """QAOA circuit on a random 3-regular graph: [(matrix, qubits)]."""
    rng = Random(seed)
    if n_qubits * 3 % 2:
        n_qubits += 1
    edges = []
    ts, _, _ = random_regular(n_qubits, 3, 2, seed)
    edge_map = {}
    for t, xs in enumerate(ts):
        for x in xs:
            edge_map.setdefault(x, []).append(t)
    edges = [tuple(v) for v in edge_map.values()]

    h = np.array([[1, 1], [1, -1]]) / math.sqrt(2)
    gates = [(h, (q,)) for q in range(n_qubits)]
    for _ in range(p_layers):
        gamma = rng.uniform(0, math.pi)
        beta = rng.uniform(0, math.pi)
        zz = np.diag([
            np.exp(-0.5j * gamma), np.exp(0.5j * gamma),
            np.exp(0.5j * gamma), np.exp(-0.5j * gamma)
        ])
        for a, b in edges:
            gates.append((zz, (a, b)))
        rx = np.array([[math.cos(beta / 2), -1j * math.sin(beta / 2)],
                       [-1j * math.sin(beta / 2), math.cos(beta / 2)]])
        for q in range(n_qubits):
            gates.append((rx, (q,)))
    return gates


def qaoa_tn(n_qubits: int = 26, p_layers: int = 4, seed: int = 0):
    """QAOA circuit converted to a TN (no fuse, hyper decomposition on)."""
    from tnco_tpu.utils.circuit import load

    arrays, ts_inds, output_inds = load(qaoa_circuit(n_qubits, p_layers,
                                                     seed),
                                        initial_state='0',
                                        final_state='0',
                                        simplify=False,
                                        decompose_hyper_inds=True,
                                        fuse=3)
    dims = {}
    for a, xs in zip(arrays, ts_inds):
        dims.update(zip(xs, np.asarray(a).shape))
    return [tuple(xs) for xs in ts_inds], frozenset(output_inds), dims


def sycamore_like_tn(m_cycles: int = 20, seed: int = 0):
    """Sycamore-53-like random circuit TN, m cycles of fsim couplers.

    Synthetic stand-in for the quantum-advantage circuit: 53 qubits on the
    Sycamore grid, per cycle one of 4 coupler patterns (ABCD-CDAB order) +
    single-qubit gate per qubit.  Gates become rank-4 tensors (no
    open-circuit simplification), inputs/outputs closed with states, so the
    TN scale matches the published networks.
    """
    qubits = _grid_qubits_53()
    qset = set(qubits)

    # Coupler patterns: partition grid edges by direction/parity
    def neighbors(q):
        r, c = q
        return [(r + 1, c), (r, c + 1)]

    patterns = {k: [] for k in 'ABCD'}
    for q in qubits:
        r, c = q
        for i, nb in enumerate(neighbors(q)):
            if nb in qset:
                if i == 0:  # vertical
                    patterns['A' if (r + c) % 2 == 0 else 'B'].append(
                        (q, nb))
                else:  # horizontal
                    patterns['C' if (r + c) % 2 == 0 else 'D'].append(
                        (q, nb))

    order = 'ABCDCDAB'
    ts_inds = []
    dims = {}
    moment = {q: 0 for q in qubits}

    def add_tensor(qs):
        legs = []
        for q in qs:
            legs.append((q, moment[q] + 1))
            legs.append((q, moment[q]))
        for q in qs:
            moment[q] += 1
        ts_inds.append(tuple(legs))
        for leg in legs:
            dims[leg] = 2

    # Initial states: rank-1 tensors on (q, 0)
    for q in qubits:
        ts_inds.append(((q, 0),))
        dims[(q, 0)] = 2

    for cycle in range(m_cycles):
        # single-qubit layer
        for q in qubits:
            add_tensor((q,))
        # coupler layer
        for q, nb in patterns[order[cycle % len(order)]]:
            add_tensor((q, nb))

    # Final states
    for q in qubits:
        ts_inds.append(((q, moment[q]),))

    return [tuple(xs) for xs in ts_inds], frozenset(), dims
