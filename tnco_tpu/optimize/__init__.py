"""Optimizer wrappers: label-space API over the device kernels.

Mirrors the reference's ``tnco/optimize`` layer (typed-core dispatch
wrappers, SURVEY.md L3) — but instead of selecting C++ template
instantiations by type suffix, these wrappers own a JAX replica state and
drive the jitted SA kernels.
"""

from tnco_tpu.optimize import prob

__all__ = ['prob']
