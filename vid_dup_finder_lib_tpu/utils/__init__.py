"""Utilities: jax configuration, phase timers, logging."""
