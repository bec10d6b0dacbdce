"""tnco-tpu: TPU-native tensor-network contraction-order optimizer.

A from-scratch, TPU-first rebuild of the capabilities of
``google-research/tnco`` (reference layout mirrored for API parity; see
SURVEY.md).  Contraction trees are flat ``int32[N, 3]`` child/parent arrays
with per-node index sets packed as ``uint32[N, W]`` bitset lanes, and the
simulated-annealing kernel runs as a jitted, ``vmap``-able JAX program in the
log2-cost domain (replacing the reference's 1024-bit floats with log-domain
arithmetic on device and exact Python bigints on host).

Public layout (mirrors the reference package ``tnco``):

- :mod:`tnco_tpu.bitset`, :mod:`tnco_tpu.ctree` — core data model.
- :mod:`tnco_tpu.optimize` — optimizer wrappers + acceptance probabilities.
- :mod:`tnco_tpu.kernels` — the JAX/Pallas SA kernels (device hot path).
- :mod:`tnco_tpu.utils` — tensor-network graph/array utilities.
- :mod:`tnco_tpu.app` — user-facing API (``Optimizer``, ``load_tn``, CLI).
- :mod:`tnco_tpu.parallel` — replica-batch runtime (vmap × device mesh).
"""

__version__ = '0.1.0'
