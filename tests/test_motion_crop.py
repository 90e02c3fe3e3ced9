"""Motion-crop tests, ported from
``vid_dup_finder_common/src/motioncrop/test.rs:9-242``."""

import numpy as np

from vid_dup_finder_lib_tpu import Crop
from vid_dup_finder_lib_tpu.ops.motion import cropdetect_motion


def frames(w, h, pixen):
    out = [np.array(p, dtype=np.uint8).reshape(h, w) for p in pixen]
    # util_generate_frames cycles to exactly 2 frames
    while len(out) < 2:
        out.append(out[0].copy())
    return out[:2]


def test_nocrop():
    f = frames(3, 3, [[255] * 9, [255] * 9])
    assert cropdetect_motion(f) == Crop.from_edge_offsets((3, 3), 0, 0, 0, 0)


def test_letterbox_static():
    pix = [
        0, 0, 0, 0, 0,
        0, 255, 255, 255, 0,
        0, 255, 255, 255, 0,
        0, 255, 255, 255, 0,
        0, 0, 0, 0, 0,
        0, 0, 0, 0, 0,
    ]
    f = frames(5, 6, [pix, list(pix)])
    assert cropdetect_motion(f) == Crop.from_edge_offsets((5, 6), 1, 1, 1, 2)


def test_2pixsquareinthemiddle():
    a = [
        255, 220, 220, 255,
        220, 80, 80, 220,
        220, 80, 80, 220,
        255, 255, 255, 255,
    ]
    b = [
        255, 220, 220, 255,
        220, 27, 27, 220,
        220, 27, 27, 220,
        255, 255, 255, 255,
    ]
    f = frames(4, 4, [a, b])
    assert cropdetect_motion(f) == Crop.from_edge_offsets((4, 4), 1, 1, 1, 1)


def test_prefer_bigger_region():
    a = [
        255, 220, 220, 255,
        220, 80, 255, 220,
        220, 255, 255, 220,
        255, 255, 255, 255,
        255, 220, 220, 255,
        220, 80, 80, 220,
        220, 80, 80, 220,
        255, 255, 255, 255,
    ]
    b = [
        255, 220, 220, 255,
        220, 20, 255, 220,
        220, 255, 255, 220,
        255, 255, 255, 255,
        255, 220, 220, 255,
        220, 20, 20, 220,
        220, 20, 20, 220,
        255, 255, 255, 255,
    ]
    f = frames(4, 8, [a, b])
    assert cropdetect_motion(f) == Crop.from_edge_offsets((4, 8), 1, 1, 5, 1)


def test_prefer_upper_region():
    a = [
        255, 220, 220, 255,
        220, 80, 80, 220,
        220, 255, 80, 220,
        255, 255, 255, 255,
        255, 220, 220, 255,
        220, 80, 80, 220,
        220, 80, 80, 220,
        255, 255, 255, 255,
    ]
    b = [
        255, 220, 220, 255,
        220, 20, 255, 220,
        220, 20, 255, 220,
        255, 255, 255, 255,
        255, 220, 220, 255,
        220, 20, 20, 220,
        220, 20, 20, 220,
        255, 255, 255, 255,
    ]
    f = frames(4, 8, [a, b])
    assert cropdetect_motion(f) == Crop.from_edge_offsets((4, 8), 1, 1, 1, 5)


def test_detect_topleft():
    a = [
        80, 220, 220, 255,
        220, 255, 255, 220,
        220, 255, 255, 220,
        255, 255, 255, 255,
        255, 220, 220, 255,
        220, 255, 255, 220,
        220, 255, 255, 220,
        255, 220, 255, 255,
    ]
    b = [
        20, 220, 220, 255,
        220, 255, 255, 220,
        220, 255, 255, 220,
        255, 255, 255, 255,
        255, 220, 220, 255,
        220, 255, 255, 220,
        220, 255, 255, 220,
        255, 255, 255, 255,
    ]
    f = frames(4, 8, [a, b])
    assert cropdetect_motion(f) == Crop.from_edge_offsets((4, 8), 0, 3, 0, 7)


def test_detect_botright():
    a = [
        255, 220, 220, 255,
        220, 255, 255, 220,
        220, 255, 255, 220,
        255, 255, 255, 255,
        255, 220, 220, 255,
        220, 255, 255, 220,
        220, 255, 20, 20,
        255, 255, 20, 20,
    ]
    b = [
        255, 220, 220, 255,
        220, 255, 255, 220,
        220, 255, 255, 220,
        255, 255, 255, 255,
        255, 220, 220, 255,
        220, 255, 255, 220,
        220, 255, 40, 20,
        255, 255, 20, 40,
    ]
    f = frames(4, 8, [a, b])
    assert cropdetect_motion(f) == Crop.from_edge_offsets((4, 8), 2, 0, 6, 0)


def test_single_frame_returns_none():
    assert cropdetect_motion([np.full((4, 4), 255, dtype=np.uint8)]) is None
