"""Golden-model cross-validation: the f64 NumPy pipeline against
independent implementations (scipy DCT, PIL Lanczos) and its own
invariants."""

import numpy as np
import pytest

from vid_dup_finder_lib_tpu.crop import Crop
from vid_dup_finder_lib_tpu.ops.golden import (
    crop_resize_golden,
    dct2_matrix,
    dct3_golden,
    frames_to_cube,
    golden_hash_from_frames,
    hash_bits_golden,
    resize_weights,
)


def test_dct2_matrix_vs_scipy():
    from scipy.fft import dct

    x = np.random.default_rng(0).normal(size=16)
    ours = dct2_matrix() @ x
    # scipy type-II unnormalized = 2 * sum x_n cos(...) -> exactly 2x ours
    theirs = dct(x, type=2, norm=None)
    assert np.allclose(theirs, 2.0 * ours, rtol=1e-12, atol=1e-12)


def test_dct3_golden_vs_scipy_signs():
    from scipy.fft import dctn

    rng = np.random.default_rng(1)
    cube = rng.normal(size=(16, 16, 16))
    ours = dct3_golden(cube)
    theirs = dctn(cube, type=2, norm=None)  # = 8x ours
    assert np.allclose(theirs, 8.0 * ours, rtol=1e-10, atol=1e-9)


def test_cube_orientation_transposes_frames():
    frames = np.zeros((16, 16, 16), dtype=np.uint8)
    frames[0, 2, 5] = 255  # frame 0, row 2, col 5
    cube = frames_to_cube(frames)
    assert cube[0, 5, 2] == 255 - 128.0  # lands at [t, x=col, y=row]
    assert cube[0, 2, 5] == -128.0


def test_resize_weights_identity():
    w = resize_weights(16, 16)
    assert np.allclose(w, np.eye(16), atol=1e-12)


def test_resize_weights_rows_sum_to_one():
    for src in (17, 64, 480, 1080):
        w = resize_weights(src, 16)
        assert np.allclose(w.sum(axis=1), 1.0, atol=1e-12)


def test_crop_resize_vs_pillow():
    """Independent-oracle bound for the fixed-point resize (PARITY
    deviation 1's residual caveat): fast_image_resize's u8 path is a
    port of Pillow's LANCZOS fixed-point resampler, differing only in
    coefficient precision (i16 Normalizer16 vs Pillow's 22-bit i32).
    Our reconstruction must therefore sit within ONE gray level of
    Pillow on a small fraction of pixels, across source geometries —
    anything larger would indicate a wrong quantization rule (wrong
    precision search, per-window normalization, rounding seed), which
    no self-generated oracle could catch."""
    from PIL import Image

    rng = np.random.default_rng(2)
    for h, w in [(123, 217), (120, 160), (480, 640), (720, 1280),
                 (33, 47), (1080, 1920)]:
        frame = rng.integers(0, 256, (h, w), dtype=np.uint8)
        ours = crop_resize_golden(frame)
        theirs = np.asarray(
            Image.fromarray(frame).resize((16, 16), Image.LANCZOS)
        )
        d = np.abs(ours.astype(int) - theirs.astype(int))
        assert d.max() <= 1, (h, w, d.max())
        assert (d > 0).mean() <= 0.05, (h, w, (d > 0).mean())
    # identity geometry: both fixed-point pipelines are exact
    frame = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    assert np.array_equal(
        crop_resize_golden(frame),
        np.asarray(Image.fromarray(frame).resize((16, 16), Image.LANCZOS)),
    )


def test_crop_resize_crop_window():
    rng = np.random.default_rng(3)
    frame = rng.integers(0, 256, (100, 100), dtype=np.uint8)
    crop = Crop.from_edge_offsets((100, 100), 10, 20, 5, 15)
    x, y, w, h = crop.as_view_args()
    via_crop_arg = crop_resize_golden(frame, crop)
    pre_cropped = crop_resize_golden(frame[y : y + h, x : x + w])
    assert np.array_equal(via_crop_arg, pre_cropped)


def test_hash_brightness_shift_changes_few_bits():
    """A small uniform brightness change only moves DC-ish bins."""
    rng = np.random.default_rng(4)
    frames = rng.integers(30, 200, (16, 64, 64), dtype=np.uint8)
    base = hash_bits_golden(
        np.stack([crop_resize_golden(f) for f in frames])
    )
    bright = hash_bits_golden(
        np.stack(
            [crop_resize_golden((f + 10).astype(np.uint8)) for f in frames]
        )
    )
    assert (base != bright).sum() < 120


def test_golden_hash_requires_16_frames():
    from vid_dup_finder_lib_tpu.errors import NotEnoughFrames

    frames = [np.zeros((32, 32), np.uint8)] * 15
    with pytest.raises(NotEnoughFrames):
        golden_hash_from_frames(frames)


def test_dct_2d_debug_roundtrip_shape():
    from vid_dup_finder_lib_tpu.ops.golden import dct_2d_debug, idct_2d_debug

    x = np.random.default_rng(5).integers(0, 256, (16, 16)).astype(float)
    f = dct_2d_debug(x)
    assert f.shape == (16, 16)
    # the reference's brute-force normalize only SCALES (no offset), so the
    # guarantee is on the range width, not the bounds (raw_dct_ops.rs:91-102)
    assert (f.max() - f.min()) == pytest.approx(2.0)
    r = idct_2d_debug(f)
    assert r.shape == (16, 16)
    assert (r.max() - r.min()) == pytest.approx(255.0)


def test_device_hash_bit_exact_vs_golden_large_corpus():
    """Pin the parity story on a large randomized corpus: the
    f32-HIGHEST device hash flips at most ~1e-5 of bits against the f64
    oracle (only coefficients within f32 rounding of zero can diverge);
    measured 4 flips / 512k bits, incl. adversarial LOW-CONTRAST cubes
    that crowd the near-zero sign boundary."""
    import numpy as np

    from vid_dup_finder_lib_tpu.ops.golden import hash_bits_golden
    from vid_dup_finder_lib_tpu.ops.hash_kernel import hash_cubes_device
    from vid_dup_finder_lib_tpu.video_hash import VideoHash

    rng = np.random.default_rng(20)
    cubes = np.concatenate(
        [
            rng.integers(0, 256, (256, 16, 16, 16), dtype=np.uint8),
            (128 + rng.integers(-2, 3, (256, 16, 16, 16))).astype(
                np.uint8
            ),
        ]
    )
    packed = hash_cubes_device(cubes)
    flips = 0
    worst = 0
    for i in range(cubes.shape[0]):
        gb = hash_bits_golden(cubes[i])
        pb = VideoHash.from_packed_u32(packed[i]).hash_bits()
        d = int((gb != pb).sum())
        flips += d
        worst = max(worst, d)
    assert flips <= 8, f"{flips} flips over 512 cubes"
    assert worst <= 2, f"{worst} flips in a single hash"


def test_fixed_point_resize_vs_f64_single_round():
    """PARITY deviation 1 closure: the golden resize is the u8 fixed-point
    two-pass (fast_image_resize's default U8 path); it may differ from the
    previous single-round f64 model by at most 1 gray level, only at
    rounding boundaries."""
    from vid_dup_finder_lib_tpu.ops.golden import crop_resize_f64

    rng = np.random.default_rng(21)
    for shape in [(123, 217), (480, 640), (16, 16), (33, 1000)]:
        frame = rng.integers(0, 256, shape, dtype=np.uint8)
        a = crop_resize_golden(frame)
        b = crop_resize_f64(frame)
        d = np.abs(a.astype(int) - b.astype(int))
        assert d.max() <= 1, shape
        # boundaries are rare: most pixels agree exactly
        assert (d > 0).mean() < 0.25, shape


def test_device_resize_bit_exact_vs_golden():
    """The device fixed-point resize computes the SAME integers as the
    host golden path — bit-exact cubes, no f32-drift tolerance."""
    from vid_dup_finder_lib_tpu.crop import Crop
    from vid_dup_finder_lib_tpu.ops.resize_device import (
        resize_frames_device,
    )

    rng = np.random.default_rng(22)
    for (h, w), crop in [
        ((120, 160), None),
        ((123, 217), None),
        ((100, 100), Crop.from_edge_offsets((100, 100), 7, 11, 3, 5)),
    ]:
        frames = rng.integers(0, 256, (3, 16, h, w), dtype=np.uint8)
        dev = resize_frames_device(frames, crop)
        for b in range(frames.shape[0]):
            exp = np.stack(
                [crop_resize_golden(f, crop) for f in frames[b]]
            )
            assert np.array_equal(dev[b], exp), (h, w, b)
