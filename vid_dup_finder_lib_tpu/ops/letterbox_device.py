"""Batched letterbox detection on device.

Device counterpart of ``ops/letterbox.py`` for same-resolution video
batches (BASELINE.json config 5: cropdetect preprocessing fused into the
device pipeline).  Per frame and side, the strip test is vectorized as:

    histogram per strip  ->  modal value (last max, as Rust's max_by_key)
    ->  pixels within tol of the mode  ->  proportion > 0.9
    ->  take-while from the edge  ->  per-frame crop  ->  union over the
    sampled frames ([::8][:8], like cropdetect_letterbox)

Histograms ride the MXU: strips one-hot against 256 values is a matmul of
the one-hot expansion with a ones vector; here we use the cheaper
sort-free formulation with comparisons + sums (VPU-friendly).

Returns per-video edge offsets; the host folds them into the
per-(resolution, crop) resize-weight buckets (``ops/resize_device.py``),
so device letterbox + device resize + the Pallas hash kernel form a fully
on-device preprocessing path.
"""

from __future__ import annotations

import functools

import numpy as np

from ..crop import Crop

MIN_PROPORTION = 0.9
TOL = 16  # cropdetect_letterbox uses AnyColour(16)

# exact integer form of `matching / strip_len > MIN_PROPORTION` used by
# the kernel (f32 division disagrees with the host's f64 at exact-0.9
# ratios like 108/120) — DERIVED from the constant so tuning it keeps
# host and device coupled
from fractions import Fraction as _Fr  # noqa: E402

_PROP_NUM = _Fr(MIN_PROPORTION).limit_denominator(1000).numerator
_PROP_DEN = _Fr(MIN_PROPORTION).limit_denominator(1000).denominator


@functools.cache
def _build(interpret_unused: bool = False):
    import jax
    import jax.numpy as jnp

    def strip_flags(strips):
        """bool[..., n_strips]: is each strip letterbox-colored?

        strips: uint8[..., n_strips, strip_len].
        """
        vals = jnp.arange(256, dtype=jnp.int32)
        s = strips.astype(jnp.int32)
        # hist[..., strip, value]
        hist = jnp.sum(
            (s[..., None] == vals), axis=-2, dtype=jnp.int32
        )
        # modal value with LAST-max tie-break (Rust max_by_key keeps the
        # last maximum): argmax over reversed values
        rev = hist[..., ::-1]
        mode = 255 - jnp.argmax(rev, axis=-1)
        # pixels within TOL of the mode, via the histogram cumsum
        csum = jnp.cumsum(hist, axis=-1)
        hi = jnp.clip(mode + TOL, 0, 255)
        lo = jnp.clip(mode - TOL, 0, 255)
        top = jnp.take_along_axis(csum, hi[..., None], axis=-1)[..., 0]
        bot_idx = jnp.maximum(lo - 1, 0)[..., None]
        bot = jnp.where(
            (lo > 0)[..., None],
            jnp.take_along_axis(csum, bot_idx, axis=-1),
            0,
        )[..., 0]
        matching = top - bot
        strip_len = strips.shape[-1]
        return _PROP_DEN * matching > _PROP_NUM * strip_len

    def take_while(flags):
        """count of leading True along the last axis."""
        all_true = jnp.cumprod(flags.astype(jnp.int32), axis=-1)
        return jnp.sum(all_true, axis=-1)

    @jax.jit
    def letterbox_batch(frames):
        """uint8[B, T, H, W] -> int32[B, 4] edge offsets (l, r, t, b).

        Per-frame crops over the sampled frames, union-reduced (min of
        each edge), with the reference's degenerate-frame fallback
        applied per frame (video_frames_gray.rs:119-127).
        """
        b, t, h, w = frames.shape
        cols = frames.transpose(0, 1, 3, 2)  # strips = columns [B,T,W,H]
        rows = frames  # strips = rows [B,T,H,W]

        lf = take_while(strip_flags(cols))
        rf = take_while(strip_flags(cols[:, :, ::-1, :]))
        tf = take_while(strip_flags(rows))
        bf = take_while(strip_flags(rows[:, :, ::-1, :]))

        # per-frame sanity fallback: all-matched frames contribute no crop
        degenerate = ((w - lf - rf) < 1) | ((h - tf - bf) < 1)
        zero = jnp.zeros_like(lf)
        lf = jnp.where(degenerate, zero, lf)
        rf = jnp.where(degenerate, zero, rf)
        tf = jnp.where(degenerate, zero, tf)
        bf = jnp.where(degenerate, zero, bf)

        # union over frames = min of each edge offset
        return jnp.stack(
            [x.min(axis=1) for x in (lf, rf, tf, bf)], axis=1
        ).astype(jnp.int32)

    return letterbox_batch


def cropdetect_letterbox_device(frames: np.ndarray) -> list[Crop]:
    """Batched letterbox detection: uint8[B, T, H, W] -> per-video Crop.

    Samples frames[:, ::8][:, :8] like ``cropdetect_letterbox``
    (video_frames_gray.rs:201-210).
    """
    b, t, h, w = frames.shape
    sampled = frames[:, ::8][:, :8]
    fn = _build()
    offsets = np.asarray(fn(sampled))
    return [
        Crop.from_edge_offsets(
            (w, h), int(l), int(r), int(tt), int(bb)
        )
        for (l, r, tt, bb) in offsets
    ]
