"""Ring-scan scaling probe over a virtual device mesh.

Measures ``parallel.ring_candidate_scan`` (the multi-chip all-pairs
primitive: row blocks per device, column blocks rotating via ppermute)
across mesh sizes.  On this machine the mesh is virtual CPU devices, so
absolute numbers are meaningless — the point is that the per-device work
and the collective pattern scale as O(N^2 / devices) and the dry-run
compiles/executes at every mesh size.

Usage: JAX_PLATFORMS=cpu python tools/bench_ring.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def main() -> None:
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    from vid_dup_finder_lib_tpu.parallel import (
        make_mesh,
        ring_candidate_scan,
    )

    rng = np.random.default_rng(0)
    n = int(os.environ.get("VDF_RING_N", "16384"))
    packed = rng.integers(0, 2**32, (n, 32), dtype=np.uint64).astype(
        np.uint32
    )
    durations = np.sort(rng.integers(30, 7200, n))

    results = {}
    for n_dev in (1, 2, 4, 8):
        if len(jax.devices()) < n_dev:
            continue
        mesh = make_mesh(n_dev)
        # warm (compile per mesh size)
        ring_candidate_scan(mesh, packed, durations, 350)
        t = time.time()
        counts, best, idx = ring_candidate_scan(
            mesh, packed, durations, 350
        )
        dt = time.time() - t
        results[n_dev] = round(dt, 3)
        assert counts.shape == (n,)

    base = results.get(1)
    print(
        json.dumps(
            {
                "metric": f"ring_scan_secs@{n}",
                "per_mesh_size": results,
                "speedup_8x": round(base / results[8], 2)
                if base and 8 in results
                else None,
                "note": "virtual CPU mesh; shape of scaling only",
            }
        )
    )


if __name__ == "__main__":
    main()
