"""Robustness sweep: crop and watermark tolerance of the hash.

Equivalent of the reference's unscored bench datasets
(``vid_dup_finder_lib/bench/{crop-horiz,crop-vert,crop-center}/
create_crop.sh`` and ``bench/watermark/create_watermark.sh``): generate
cropped (10-95%, three geometries) and watermarked (opacity 10-90%)
variants of a source video, hash each variant, and report the normalized
Hamming distance to the original — with and without cropdetect.

Usage: python tools/robustness.py [video]  (defaults to a test fixture)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vid_dup_finder_lib_tpu.definitions import Cropdetect  # noqa: E402
from vid_dup_finder_lib_tpu.models.builder import (  # noqa: E402
    CreationOptions,
    VideoHashBuilder,
)


def _variants(src: str, out_dir: str):
    """Yield (name, path) for crop/watermark variants written with cv2."""
    import cv2

    cap = cv2.VideoCapture(src)
    fps = cap.get(cv2.CAP_PROP_FPS) or 24.0
    frames = []
    while True:
        ok, img = cap.read()
        if not ok:
            break
        frames.append(img)
    cap.release()
    h, w = frames[0].shape[:2]

    def write(name, transform):
        out = os.path.join(out_dir, f"{name}.mp4")
        sample = transform(frames[0])
        vw = cv2.VideoWriter(
            out,
            cv2.VideoWriter_fourcc(*"mp4v"),
            fps,
            (sample.shape[1], sample.shape[0]),
        )
        for f in frames:
            vw.write(transform(f))
        vw.release()
        return out

    rng = np.random.default_rng(0)
    wm = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)

    for pct in (10, 25, 50, 75, 95):
        keep = 1.0 - pct / 100.0
        cw = max(16, int(w * keep))
        ch = max(16, int(h * keep))
        yield f"crop-horiz-{pct}", write(
            f"crop-horiz-{pct}", lambda f, cw=cw: f[:, :cw]
        )
        yield f"crop-vert-{pct}", write(
            f"crop-vert-{pct}", lambda f, ch=ch: f[:ch, :]
        )
        x0, y0 = (w - cw) // 2, (h - ch) // 2
        yield f"crop-center-{pct}", write(
            f"crop-center-{pct}",
            lambda f, x0=x0, y0=y0, cw=cw, ch=ch: f[y0 : y0 + ch, x0 : x0 + cw],
        )
    for opacity in (10, 30, 50, 70, 90):
        a = opacity / 100.0
        yield f"watermark-{opacity}", write(
            f"watermark-{opacity}",
            lambda f, a=a: (f * (1 - a) + wm * a).astype(np.uint8),
        )


def main() -> None:
    if len(sys.argv) > 1:
        src = sys.argv[1]
    else:
        from tests.fixtures import make_fixture_videos

        src = make_fixture_videos(
            os.path.join(os.path.dirname(__file__), "..", "tests", "data")
        )[0]

    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        for mode in (Cropdetect.NONE, Cropdetect.MOTION):
            builder = VideoHashBuilder.from_options(
                CreationOptions(cropdetect=mode)
            )
            base = builder.hash(src)
            for name, path in _variants(src, tmp):
                try:
                    h = builder.hash(path)
                    d = base.normalized_hamming_distance(h)
                except Exception as e:  # noqa: BLE001
                    d = None
                results.setdefault(name, {})[mode.value] = (
                    round(d, 3) if d is not None else "error"
                )
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
