"""End-to-end hashing throughput including host decode.

The reference's wall time is decode-dominated (SURVEY.md section 7.4); this
measures the honest videos/second of the streaming pipeline
(``models.pipeline.hash_videos``: decode pool -> crop/resize -> batched
device hash) over N copies of a fixture video.

Usage: python tools/bench_e2e_hash.py   (VDF_E2E_N copies, default 60)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from tests.fixtures import make_fixture_videos
    from vid_dup_finder_lib_tpu.models.pipeline import hash_videos
    from vid_dup_finder_lib_tpu.utils.jaxconfig import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    n = int(os.environ.get("VDF_E2E_N", "60"))
    src = make_fixture_videos(
        os.path.join(os.path.dirname(__file__), "..", "tests", "data")
    )[0]

    with tempfile.TemporaryDirectory() as tmp:
        paths = []
        for i in range(n):
            p = os.path.join(tmp, f"v{i:04}.mp4")
            shutil.copy(src, p)
            paths.append(p)

        hash_videos(paths[:2])  # warm compiles
        t = time.time()
        results = hash_videos(paths)
        dt = time.time() - t

        # device-preproc variant: host decodes only; letterbox + resize +
        # hash all run on device (reference hot loop #3, video_hash.rs:59)
        hash_videos(paths[:2], device_preproc=True)  # warm
        t = time.time()
        results_dev = hash_videos(paths, device_preproc=True)
        dt_dev = time.time() - t

    ok = sum(1 for v in results.values() if not isinstance(v, Exception))
    ok_dev = sum(
        1 for v in results_dev.values() if not isinstance(v, Exception)
    )
    print(
        json.dumps(
            {
                "metric": "e2e_hash_videos_per_sec",
                "value": round(n / dt, 2),
                "unit": "videos/s (incl. decode, 12s 160x120 clips)",
                "n": n,
                "ok": ok,
                "secs": round(dt, 2),
                "device_preproc_rate": round(n / dt_dev, 2),
                "device_preproc_ok": ok_dev,
            }
        )
    )


if __name__ == "__main__":
    main()
