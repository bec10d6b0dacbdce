"""JAX SA kernels: the device hot path."""
