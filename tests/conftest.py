"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

This environment pre-imports jax via a sitecustomize hook and pins
``JAX_PLATFORMS=axon`` (one real TPU through a tunnel), so plain env-var
overrides are ineffective.  Instead we update the jax config before any
backend is initialized — tests always run on an 8-device virtual CPU mesh
(SURVEY.md section 4: kernel tests on platform=cpu with a faked mesh).
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass  # a backend is already up (e.g. user-forced); leave it alone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
