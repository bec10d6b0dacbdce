"""User-facing API: TN model, ingestion, optimizers, CLI.

Mirrors the reference public surface (tnco/app/__init__.py:16-22).
"""

from tnco_tpu.app.app import dump_results, load_tn, Optimizer
from tnco_tpu.app.tn import Tensor, TensorNetwork

__all__ = ['Tensor', 'TensorNetwork', 'load_tn', 'dump_results', 'Optimizer']
