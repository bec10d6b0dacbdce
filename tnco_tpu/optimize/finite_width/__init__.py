"""Finite-width (memory-constrained) SA optimizer wrappers."""

from tnco_tpu.optimize.finite_width.cost_model import SimpleCostModel
from tnco_tpu.optimize.finite_width.optimizer import Optimizer

__all__ = ['Optimizer', 'SimpleCostModel']
