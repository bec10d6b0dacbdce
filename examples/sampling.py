"""Circuit bitstring sampling walkthrough (BGL, PRL 128, 220503).

Run: python examples/sampling.py
"""

import math

import numpy as np

from tnco_tpu.app.circuit import Sampler

H = np.array([[1, 1], [1, -1]]) / math.sqrt(2)
CX = np.eye(4)[[0, 1, 3, 2]]
T = np.diag([1, np.exp(1j * math.pi / 4)])

# A small entangling circuit: H-CX ladder with T phases
circuit = []
for q in range(4):
    circuit.append((H, (q,)))
for q in range(3):
    circuit.append((CX, (q, q + 1)))  # classical permutation: fast path
    circuit.append((T, (q + 1,)))

sampler = Sampler(seed=0)

# Phase 1 (expensive, reusable): optimize one partial TN per gate prefix
state = sampler.sample(circuit, return_intermediate_state_only=True,
                       fuse=3, betas=(0, 30), n_steps=30, n_runs=4)

# Phase 2 (cheap, repeatable): draw samples
hits, qubits = sampler.sample(state, n_samples=200,
                              qubit_order=(0, 1, 2, 3),
                              betas=(0, 30), n_steps=30)
print('qubit order:', qubits)
for bitstring, frac in list(hits.items())[:8]:
    print(f'  {bitstring}: {frac:.3f}')

# Memory-capped sampling (beyond the reference, which raises
# NotImplementedError for finite max_width): the width-capped optimizer
# slices the amplitude networks and each amplitude is executed one
# projected pass per slice assignment, summed exactly.
capped = Sampler(max_width=2.0, seed=0)
hits_c, _ = capped.sample(circuit, n_samples=100, fuse=3,
                          qubit_order=(0, 1, 2, 3),
                          betas=(0, 30), n_steps=30, n_runs=4)
print('width-capped (max_width=2.0) top bitstrings:')
for bitstring, frac in list(hits_c.items())[:4]:
    print(f'  {bitstring}: {frac:.3f}')
