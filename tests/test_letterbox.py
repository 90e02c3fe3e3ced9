"""Letterbox detection tests, ported from the reference's hand-drawn pixel
matrices (``vid_dup_finder_common/src/video_frames_gray.rs:216-459``)."""

import numpy as np

from vid_dup_finder_lib_tpu import Crop
from vid_dup_finder_lib_tpu.ops.letterbox import (
    AnyColour,
    BlackWhite,
    cropdetect_letterbox,
    letterbox_crop_frame,
)


def img(w, h, pix):
    return np.array(pix, dtype=np.uint8).reshape(h, w)


def test_letterbox_crop_white_img_finds_no_crop():
    i = img(3, 3, [255] * 9)
    exp = Crop.from_edge_offsets((3, 3), 0, 0, 0, 0)
    assert letterbox_crop_frame(i, BlackWhite(1)) == exp
    assert letterbox_crop_frame(i, AnyColour(1)) == exp


def test_letterbox_crop_black_img_finds_no_crop():
    i = img(3, 3, [0] * 9)
    exp = Crop.from_edge_offsets((3, 3), 0, 0, 0, 0)
    assert letterbox_crop_frame(i, BlackWhite(1)) == exp
    assert letterbox_crop_frame(i, AnyColour(1)) == exp


def test_letterbox_crop_any_colour_gray():
    i = img(3, 3, [127, 127, 127, 127, 0, 127, 127, 127, 127])
    assert letterbox_crop_frame(i, BlackWhite(1)) == Crop.from_edge_offsets(
        (3, 3), 0, 0, 0, 0
    )
    assert letterbox_crop_frame(i, AnyColour(1)) == Crop.from_edge_offsets(
        (3, 3), 1, 1, 1, 1
    )


def test_letterbox_crop_any_threshold():
    i = img(3, 3, [120, 130, 120, 130, 0, 130, 120, 130, 120])
    assert letterbox_crop_frame(i, AnyColour(9)) == Crop.from_edge_offsets(
        (3, 3), 0, 0, 0, 0
    )
    assert letterbox_crop_frame(i, AnyColour(10)) == Crop.from_edge_offsets(
        (3, 3), 1, 1, 1, 1
    )


def test_letterbox_crop_onepix():
    i = img(3, 3, [0, 0, 0, 0, 127, 0, 0, 0, 0])
    exp = Crop.from_edge_offsets((3, 3), 1, 1, 1, 1)
    assert letterbox_crop_frame(i, BlackWhite(10)) == exp
    assert letterbox_crop_frame(i, AnyColour(1)) == exp


def test_letterbox_crop_topcorner():
    i = img(3, 3, [127, 0, 0, 0, 0, 0, 0, 0, 0])
    exp = Crop.from_edge_offsets((3, 3), 0, 2, 0, 2)
    assert letterbox_crop_frame(i, BlackWhite(10)) == exp
    assert letterbox_crop_frame(i, AnyColour(1)) == exp


def test_letterbox_crop_rightedge():
    i = img(3, 3, [0, 0, 200, 0, 0, 120, 0, 0, 100])
    exp = Crop.from_edge_offsets((3, 3), 2, 0, 0, 0)
    assert letterbox_crop_frame(i, BlackWhite(10)) == exp
    assert letterbox_crop_frame(i, AnyColour(1)) == exp


def test_letterbox_crop_bottom_right_2pix():
    i = img(3, 3, [0, 0, 0, 0, 127, 0, 0, 0, 127])
    exp = Crop.from_edge_offsets((3, 3), 1, 0, 1, 0)
    assert letterbox_crop_frame(i, BlackWhite(10)) == exp
    assert letterbox_crop_frame(i, AnyColour(1)) == exp


def test_letterbox_crop_2pix_bottom():
    pix = [
        0, 0, 0, 0, 0,
        0, 255, 255, 255, 0,
        0, 255, 255, 255, 0,
        0, 255, 255, 255, 0,
        0, 0, 0, 0, 0,
        0, 0, 0, 0, 0,
    ]
    i = img(5, 6, pix)
    assert letterbox_crop_frame(i, AnyColour(1)) == Crop.from_edge_offsets(
        (5, 6), 1, 1, 1, 2
    )


def test_cropdetect_letterbox_sequence_union():
    # sequence detection only samples frames[::8][:8] (step_by(8).take(8));
    # with frames 0 and 8 differing, the union takes the loosest crop.
    a = img(5, 6, [
        0, 0, 0, 0, 0,
        0, 255, 255, 255, 0,
        0, 255, 255, 255, 0,
        0, 255, 255, 255, 0,
        0, 0, 0, 0, 0,
        0, 0, 0, 0, 0,
    ])
    b = np.full((6, 5), 255, dtype=np.uint8)
    seq = [a] + [a] * 7 + [b]  # indices 0..8; only 0 and 8 are sampled
    got = cropdetect_letterbox(seq)
    assert got == Crop.from_edge_offsets((5, 6), 0, 0, 0, 0)
    # a frame at an unsampled index must not influence the result
    seq2 = [a, b] + [a] * 7
    assert cropdetect_letterbox(seq2) == Crop.from_edge_offsets((5, 6), 1, 1, 1, 2)
    assert cropdetect_letterbox([]) is None


def test_device_letterbox_matches_host():
    """Batched device letterbox == per-video host cropdetect_letterbox."""
    import numpy as np

    from vid_dup_finder_lib_tpu.ops.letterbox import cropdetect_letterbox
    from vid_dup_finder_lib_tpu.ops.letterbox_device import (
        cropdetect_letterbox_device,
    )

    rng = np.random.default_rng(0)
    B, T, H, W = 5, 16, 48, 64
    frames = rng.integers(0, 256, (B, T, H, W), dtype=np.uint8)
    # video 0: plain noise (no crop)
    # video 1: black letterbox bars top/bottom 6 px
    frames[1, :, :6] = 0
    frames[1, :, -6:] = 0
    # video 2: pillarbox left/right 10 px of near-constant gray
    frames[2, :, :, :10] = rng.integers(100, 104, (T, H, 10))
    frames[2, :, :, -10:] = 102
    # video 3: fully constant (degenerate -> no crop)
    frames[3] = 77
    # video 4: asymmetric: top 3 black only
    frames[4, :, :3] = 0

    got = cropdetect_letterbox_device(frames)
    for b in range(B):
        exp = cropdetect_letterbox(list(frames[b]))
        assert got[b] == exp, (b, got[b], exp)
