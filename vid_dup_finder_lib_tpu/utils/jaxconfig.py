"""JAX runtime configuration helpers."""

from __future__ import annotations

import os

_DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "vdf_tpu_jax_cache"
)


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Persist compiled executables across processes.

    Essential on tunneled TPU deployments where a single kernel compile can
    take minutes of remote-compile round trips.
    """
    import jax

    path = cache_dir or os.environ.get(
        "VDF_TPU_JAX_CACHE", _DEFAULT_CACHE_DIR
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # cache EVERYTHING: with a >= 1s floor, small programs (e.g. the
        # batch hash executable) compiled sub-second on a healthy remote
        # helper and were never persisted — then recompiled from scratch
        # on every run, hanging whenever the helper degrades
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", -1
        )
    except Exception:
        pass  # older jax without these flags
