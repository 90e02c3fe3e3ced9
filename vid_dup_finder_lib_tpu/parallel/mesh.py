"""Device-mesh helpers."""

from __future__ import annotations


def make_mesh(n_devices: int | None = None, axis: str = "x"):
    """A 1D mesh over the first ``n_devices`` devices."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devs)} "
                "(set --xla_force_host_platform_device_count for CPU tests)"
            )
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))
