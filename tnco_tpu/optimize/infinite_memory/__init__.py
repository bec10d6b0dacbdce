"""Infinite-memory (unconstrained) SA optimizer wrappers."""

from tnco_tpu.optimize.infinite_memory.cost_model import SimpleCostModel
from tnco_tpu.optimize.infinite_memory.optimizer import Optimizer

__all__ = ['Optimizer', 'SimpleCostModel']
