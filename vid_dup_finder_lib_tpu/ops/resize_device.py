"""Device-side batched crop+resize.

The Lanczos3 crop+resize is two weight-matrix products per frame
(``ops/golden.resize_weights``), so for a batch of same-resolution videos
the whole preprocessing stage becomes two batched MXU matmuls:

    cubes[B, 16, 16, 16] = round(W_v [16, H] @ frames[B, 16, H, W] @ W_h^T [W, 16])

This is the "crop+resize as matmul by precomputed per-resolution weight
matrices" design from SURVEY.md section 7.2 step 4.  The host groups videos
into (resolution, crop) buckets, precomputes the weight pair per bucket
(f32; weights are exact f64 cosine-window sums rounded once), and the
device turns raw frame stacks into DCT-ready cubes.

Trade-off (documented): shipping full-resolution frames costs
16*H*W bytes/video of h2d; on production PCIe (10-30 GB/s) device resize
wins, behind this dev tunnel (~25 MB/s) the host path is faster, so the
pipeline keeps host resize as its default and this path is opt-in.
"""

from __future__ import annotations

import functools

import numpy as np

from ..crop import Crop
from ..definitions import DCT_SIZE
from .golden import resize_weights


@functools.lru_cache(maxsize=256)
def _weights_for(
    height: int, width: int, crop_args: tuple[int, int, int, int] | None
) -> tuple[np.ndarray, np.ndarray]:
    """(W_v [16, H], W_h [16, W]) f32 for one (resolution, crop) bucket."""
    if crop_args is None:
        x, y, cw, ch = 0, 0, width, height
    else:
        x, y, cw, ch = crop_args
    wv = resize_weights(
        height, DCT_SIZE, crop_start=float(y), crop_size=float(ch)
    ).astype(np.float32)
    wh = resize_weights(
        width, DCT_SIZE, crop_start=float(x), crop_size=float(cw)
    ).astype(np.float32)
    return wv, wh


@functools.cache
def _build_resize(interpret_unused: bool = False):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def resize_batch(frames, wv, wh):
        """uint8[B, 16, H, W] -> uint8[B, 16, 16, 16] (round-half-up)."""
        x = frames.astype(jnp.float32)
        x = jnp.einsum(
            "oh,bthw->btow", wv, x,
            precision=jax.lax.Precision.HIGHEST,
        )
        x = jnp.einsum(
            "btow,pw->btop", x, wh,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0).astype(jnp.uint8)

    return resize_batch


def resize_frames_device(
    frames: np.ndarray, crop: Crop | None = None
) -> np.ndarray:
    """Batched device crop+resize: uint8[B, 16, H, W] -> uint8[B, 16, 16, 16].

    All frames in the batch share one resolution and crop (one bucket).
    """
    import jax.numpy as jnp

    b, t, h, w = frames.shape
    assert t == DCT_SIZE
    crop_args = None if crop is None else crop.as_view_args()
    wv, wh = _weights_for(h, w, crop_args)
    fn = _build_resize()
    out = fn(jnp.asarray(frames), jnp.asarray(wv), jnp.asarray(wh))
    return np.asarray(out)
