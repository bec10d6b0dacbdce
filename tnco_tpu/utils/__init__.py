"""Tensor-network graph and array utilities."""
