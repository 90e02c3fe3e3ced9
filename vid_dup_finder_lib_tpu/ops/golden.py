"""Golden (NumPy, float64) model of the hash pipeline.

This is the parity oracle for every device kernel: crop+resize -> center ->
3D DCT-II -> sign -> bitpack, reproducing the reference's math exactly:

* resize: ``fast_image_resize::Resizer::new()`` default = Lanczos3
  convolution (``vid_dup_finder_common/src/resize_gray.rs:11-54``), computed
  here as two separable weight-matrix products in f64 with a single final
  round-to-u8 (the reference's u8 fixed-point path rounds after each axis;
  the <=1 LSB difference is absorbed by the search tolerance).
* DCT: unnormalized DCT-II along each axis of the 16x16x16 cube
  (``raw_dct_ops.rs:107-142``); only coefficient *signs* survive, so any
  uniform positive per-axis scale is parity-equivalent.
* cube orientation: ``cube[t, x, y] = frame_t[y, x] - 128``  — the reference
  writes pixels as ``frames_matrix[[frame, col, row]]`` (``dct_3d.rs:40-44``),
  i.e. each frame enters the cube transposed.
* bits: ``coeff > 0`` over the ``[..10, ..10, ..10]`` corner in C order
  (``dct_3d.rs:55-66``), packed LSB-first (``video_hash.rs:64-70``).
"""

from __future__ import annotations

import numpy as np

from ..crop import Crop
from ..definitions import DCT_SIZE, HASH_SIZE
from ..video_hash import VideoHash, pack_bits

LANCZOS_A = 3.0  # fast_image_resize default filter = Lanczos3


def dct2_matrix(n: int = DCT_SIZE, dtype=np.float64) -> np.ndarray:
    """Unnormalized DCT-II matrix: D[k, j] = cos(pi/n * k * (j + 0.5)).

    ``D @ x`` equals rustdct's ``process_dct2`` on ``x`` (raw_dct_ops.rs:113).
    """
    k = np.arange(n, dtype=np.float64)[:, None]
    j = np.arange(n, dtype=np.float64)[None, :]
    return np.cos(np.pi / n * k * (j + 0.5)).astype(dtype)


def _lanczos3(x: np.ndarray) -> np.ndarray:
    """sinc(x) * sinc(x/3) windowed to |x| < 3."""
    out = np.sinc(x) * np.sinc(x / LANCZOS_A)
    return np.where(np.abs(x) < LANCZOS_A, out, 0.0)


def resize_weights(
    src_size: int,
    dst_size: int,
    crop_start: float = 0.0,
    crop_size: float | None = None,
    dtype=np.float64,
) -> np.ndarray:
    """Dense Lanczos3 convolution weights W[dst_size, src_size].

    ``W @ column_of_pixels`` resizes one axis; weights follow the standard
    convolution-resampler construction (filter support scaled by the
    downsampling factor, per-destination-pixel window, normalized to sum 1)
    used by fast_image_resize's default path.
    """
    if crop_size is None:
        crop_size = float(src_size)
    scale = crop_size / dst_size
    filter_scale = max(scale, 1.0)
    support = LANCZOS_A * filter_scale

    # Window clamping respects the crop region (the reference materializes
    # the crop before resizing, video_hash_builder.rs:199-203, so samples
    # never come from outside it).
    region_lo = max(0, int(np.floor(crop_start)))
    region_hi = min(src_size, int(np.ceil(crop_start + crop_size)))

    w = np.zeros((dst_size, src_size), dtype=np.float64)
    for j in range(dst_size):
        center = crop_start + (j + 0.5) * scale
        lo = max(region_lo, int(center - support + 0.5))
        hi = min(region_hi, int(center + support + 0.5))
        i = np.arange(lo, hi, dtype=np.float64)
        k = _lanczos3((i + 0.5 - center) / filter_scale)
        s = k.sum()
        if s != 0.0:
            k = k / s
        w[j, lo:hi] = k
    return w.astype(dtype)


def crop_resize_golden(
    frame: np.ndarray, crop: Crop | None = None, dst: int = DCT_SIZE
) -> np.ndarray:
    """Crop+resize a grayscale frame (u8 [H, W]) to [dst, dst] u8.

    Equivalent of ``crop_resize_buf`` (resize_gray.rs:11-54): the crop window
    is folded into the convolution weights.
    """
    frame = np.asarray(frame)
    h, w = frame.shape
    if crop is None:
        crop = Crop.from_edge_offsets((w, h), 0, 0, 0, 0)
    x, y, cw, ch = crop.as_view_args()
    wv = resize_weights(h, dst, crop_start=float(y), crop_size=float(ch))
    wh = resize_weights(w, dst, crop_start=float(x), crop_size=float(cw))
    out = wv @ frame.astype(np.float64) @ wh.T
    return np.clip(np.floor(out + 0.5), 0.0, 255.0).astype(np.uint8)


def dct_2d_debug(matrix: np.ndarray) -> np.ndarray:
    """2D DCT-II with brute-force [-1, 1] normalization.

    Parity shim for the reference's unused-but-kept debug ops
    (raw_dct_ops.rs:8-46); not on the hash path.
    """
    d = dct2_matrix(matrix.shape[0])
    out = d @ matrix.astype(np.float64) @ d.T
    rng = out.max() - out.min()
    return out * (2.0 / rng) if rng else out


def idct_2d_debug(matrix: np.ndarray) -> np.ndarray:
    """Inverse (DCT-III) with [0, 255] normalization (raw_dct_ops.rs:48-78)."""
    d = dct2_matrix(matrix.shape[0])
    out = d.T @ matrix.astype(np.float64) @ d
    rng = out.max() - out.min()
    return out * (255.0 / rng) if rng else out


def dct3_golden(cube: np.ndarray) -> np.ndarray:
    """Unnormalized DCT-II along all three axes of a [16,16,16] f64 cube."""
    d = dct2_matrix()
    # axis 2 (y), then axis 1 (x), then axis 0 (t) — order irrelevant in exact
    # arithmetic; matches raw_dct_ops.rs:113-136's three rounds.
    out = np.einsum("ky,txy->txk", d, cube)
    out = np.einsum("jx,txk->tjk", d, out)
    out = np.einsum("it,tjk->ijk", d, out)
    return out


def frames_to_cube(frames16: np.ndarray) -> np.ndarray:
    """[16,16,16] u8 frames (t, row, col) -> centered f64 cube (t, x, y).

    Reproduces dct_3d.rs:40-44: pixel (col, row) lands at cube[t, col, row],
    centered as luma - 128.
    """
    frames16 = np.asarray(frames16, dtype=np.float64)
    assert frames16.shape == (DCT_SIZE, DCT_SIZE, DCT_SIZE), frames16.shape
    return np.transpose(frames16, (0, 2, 1)) - 128.0


def hash_bits_golden(frames16: np.ndarray) -> np.ndarray:
    """16 frames of 16x16 u8 -> 1000 hash bits (bool, C order over t,x,y)."""
    coeffs = dct3_golden(frames_to_cube(frames16))
    corner = coeffs[:HASH_SIZE, :HASH_SIZE, :HASH_SIZE]
    return (corner > 0.0).reshape(-1)


def golden_hash_from_frames(
    frames: list[np.ndarray] | np.ndarray,
    src_path: str = "",
    duration: int = 0,
    crop: Crop | None = None,
) -> VideoHash:
    """Full golden pipeline: per-frame crop+resize to 16x16, then 3D-DCT sign
    hash.  ``frames`` are u8 [H, W] arrays (>= 16 of them; extras ignored,
    matching ``Dct3d::from_images``'s take(16))."""
    frames = list(frames)
    if len(frames) < DCT_SIZE:
        from ..errors import NotEnoughFrames

        raise NotEnoughFrames()
    small = np.stack(
        [crop_resize_golden(f, crop) for f in frames[:DCT_SIZE]]
    )
    bits = hash_bits_golden(small)
    return VideoHash(pack_bits(bits), src_path, duration)
