"""Procedural fixture videos for end-to-end tests.

The reference bundles 6 real clips (2 scenes x 3 encodings) and asserts the
search finds exactly 2 duplicate groups of 3
(``vid_dup_finder_lib/examples/example.rs:77-82``).  Two of those clips are
AV1, which no decoder in this environment can read, so we synthesize the
same shape of dataset: two distinct procedural "scenes", three variants
each (plain, brightness-shifted, letterboxed), written with cv2.
"""

from __future__ import annotations

import os

import numpy as np

W, H, FPS, SECONDS = 160, 120, 24.0, 12


def _scene(seed: int, t: float) -> np.ndarray:
    """A deterministic, smoothly-moving grayscale frame."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    img = np.full((H, W), 100.0)
    for k in range(6):
        cx = (rng.uniform(0, W) + 20.0 * np.sin(t * (0.3 + 0.1 * k) + k)) % W
        cy = (rng.uniform(0, H) + 15.0 * np.cos(t * (0.4 + 0.07 * k) + 2 * k)) % H
        r = rng.uniform(10, 28)
        amp = rng.uniform(-90, 110)
        img += amp * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * r * r)))
    return np.clip(img, 0, 255).astype(np.uint8)


def _write(path: str, frames) -> None:
    import cv2

    vw = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), FPS, (W, H), isColor=False
    )
    assert vw.isOpened(), f"VideoWriter failed for {path}"
    for f in frames:
        vw.write(f)
    vw.release()


def make_fixture_videos(out_dir: str) -> list[str]:
    """Create 6 videos: {scene1, scene2} x {plain, bright, letterbox}.
    Idempotent: returns existing files when present."""
    os.makedirs(out_dir, exist_ok=True)
    names = [
        "cat.1.mp4", "cat.2.mp4", "cat.3.mp4",
        "dog.1.mp4", "dog.2.mp4", "dog.3.mp4",
    ]
    paths = [os.path.join(out_dir, n) for n in names]
    if all(os.path.exists(p) for p in paths):
        return paths

    n_frames = int(FPS * SECONDS)
    for scene_i, base in enumerate(["cat", "dog"]):
        frames = [
            _scene(1234 + scene_i, i / FPS) for i in range(n_frames)
        ]
        # plain
        _write(os.path.join(out_dir, f"{base}.1.mp4"), frames)
        # brightness shifted
        bright = [np.clip(f.astype(np.int16) + 12, 0, 255).astype(np.uint8)
                  for f in frames]
        _write(os.path.join(out_dir, f"{base}.2.mp4"), bright)
        # letterboxed: black bars top/bottom, content squeezed
        import cv2

        lb = []
        inner_h = H - 2 * 16
        for f in frames:
            small = cv2.resize(f, (W, inner_h), interpolation=cv2.INTER_AREA)
            canvas = np.zeros((H, W), dtype=np.uint8)
            canvas[16 : 16 + inner_h] = small
            lb.append(canvas)
        _write(os.path.join(out_dir, f"{base}.3.mp4"), lb)
    return paths
