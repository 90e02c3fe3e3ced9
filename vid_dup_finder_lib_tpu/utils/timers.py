"""Phase timing + profiler hooks.

Replaces the reference's compile-time ``print_timings`` feature
(``vid_dup_finder_app/Cargo.toml:30``, timing prints across app_fns.rs) with
runtime switches: set ``VDF_PRINT_TIMINGS=1`` for phase wall-clock prints,
and ``VDF_JAX_TRACE_DIR=/path`` to capture a jax.profiler trace around the
device phases.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time


def timings_enabled() -> bool:
    return os.environ.get("VDF_PRINT_TIMINGS", "") not in ("", "0")


@contextlib.contextmanager
def phase_timer(name: str):
    start = time.time()
    try:
        yield
    finally:
        if timings_enabled():
            print(
                f"{name} time: {time.time() - start}",
                file=sys.stdout,
            )


@contextlib.contextmanager
def maybe_jax_trace():
    trace_dir = os.environ.get("VDF_JAX_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
