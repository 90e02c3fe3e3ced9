"""Measure the real usable HBM on this chip by ballast allocation.

``memory_stats()`` returns nothing on this stack (every
BENCH_SCALE_r04.json line had ``hbm_peak_gb: null``), so the 12 GB
``VDF_HBM_BUDGET_GB`` default behind ``should_split`` /
``ring_capacity_ok`` had no measured backing (round-4 VERDICT weak #4).
This probe bisects the largest single device buffer that materializes
without RESOURCE_EXHAUSTED — the practical single-allocation watermark
a search state can plan against.

Each attempt allocates uint8[G bytes] via a jitted fill (forcing a real
materialization, not a lazy zeros), fetches one element d2h to force
completion through the tunnel, then deletes the buffer.  Prints one
JSON line.

Env: VDF_HBM_LO / VDF_HBM_HI (GB, default 8 / 16), VDF_HBM_STEPS
(bisect iterations, default 5).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from vid_dup_finder_lib_tpu.utils.jaxconfig import (  # noqa: E402
    enable_compilation_cache,
)


def try_alloc(gb: float) -> bool:
    import jax
    import jax.numpy as jnp

    nbytes = int(gb * 2**30)
    # [rows, 1024] uint8 keeps shapes tile-friendly
    rows = nbytes // 1024
    try:
        @jax.jit
        def fill():
            return jnp.full((rows, 1024), 7, jnp.uint8)

        buf = fill()
        v = int(np.asarray(buf[0, 0]))  # force completion (tunnel)
        del buf
        return v == 7
    except Exception as e:  # RESOURCE_EXHAUSTED lands here
        msg = str(e)[:200]
        print(f"# {gb:.2f} GB failed: {msg}", file=sys.stderr, flush=True)
        return False


def main() -> None:
    enable_compilation_cache()
    lo = float(os.environ.get("VDF_HBM_LO", "8"))
    hi = float(os.environ.get("VDF_HBM_HI", "16"))
    steps = int(os.environ.get("VDF_HBM_STEPS", "5"))

    t0 = time.time()
    assert try_alloc(lo), f"even {lo} GB failed; lower VDF_HBM_LO"
    ok, bad = lo, hi
    if try_alloc(hi):
        ok = hi
        bad = None
    else:
        for _ in range(steps):
            mid = (ok + bad) / 2
            if try_alloc(mid):
                ok = mid
            else:
                bad = mid

    print(
        json.dumps(
            {
                "metric": "hbm_single_alloc_watermark_gb",
                "value": round(ok, 2),
                "unit": "GB (largest single materialized device buffer)",
                "first_failure_gb": round(bad, 2) if bad else None,
                "probe_secs": round(time.time() - t0, 1),
                "budget_default_gb": float(
                    os.environ.get("VDF_HBM_BUDGET_GB", "12")
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
