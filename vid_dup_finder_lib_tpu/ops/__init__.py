"""Compute kernels: golden NumPy models and JAX/Pallas device paths."""
