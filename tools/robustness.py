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

    # crop labels are KEEP fractions, like the reference's
    # create_crop.sh ("crop=iw*$CROP:..." for CROP in 0.1..0.95)
    for keep_pct in (95, 75, 50, 25, 10):
        keep = keep_pct / 100.0
        cw = max(16, int(w * keep))
        ch = max(16, int(h * keep))
        yield f"crop-horiz-{keep_pct}", write(
            f"crop-horiz-{keep_pct}", lambda f, cw=cw: f[:, :cw]
        )
        yield f"crop-vert-{keep_pct}", write(
            f"crop-vert-{keep_pct}", lambda f, ch=ch: f[:ch, :]
        )
        x0, y0 = (w - cw) // 2, (h - ch) // 2
        yield f"crop-center-{keep_pct}", write(
            f"crop-center-{keep_pct}",
            lambda f, x0=x0, y0=y0, cw=cw, ch=ch: f[y0 : y0 + ch, x0 : x0 + cw],
        )

    # added letterbox bars (the transformation cropdetect exists to undo:
    # a letterboxed copy should hash like the original when detection is
    # on, and diverge when it's off)
    for bar_pct in (10, 25, 40):
        by = int(h * bar_pct / 100 / 2)
        bx = int(w * bar_pct / 100 / 2)

        def pad(f, by=by, bx=bx):
            out = np.zeros_like(f)
            inner = cv2.resize(
                f, (w - 2 * bx, h - 2 * by), interpolation=cv2.INTER_AREA
            )
            out[by : h - by, bx : w - bx] = inner
            return out

        yield f"letterbox-{bar_pct}", write(f"letterbox-{bar_pct}", pad)

    # watermark = red text drawn bottom-left at the given opacity, like
    # create_watermark.sh's drawtext=text='watermark':x=10:y=H-th-10:
    # fontsize=30:fontcolor=red@$OPACITY
    def draw_wm(f, a):
        out = f.copy()
        overlay = f.copy()
        cv2.putText(
            overlay, "watermark", (10, h - 10),
            cv2.FONT_HERSHEY_SIMPLEX, 1.0, (0, 0, 255), 2,
        )
        return cv2.addWeighted(overlay, a, out, 1 - a, 0)

    for opacity in (10, 30, 50, 70, 90):
        a = opacity / 100.0
        yield f"watermark-{opacity}", write(
            f"watermark-{opacity}", lambda f, a=a: draw_wm(f, a)
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
        for mode in (Cropdetect.NONE, Cropdetect.LETTERBOX, Cropdetect.MOTION):
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
