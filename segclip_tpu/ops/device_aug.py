"""On-device train-time augmentation: bicubic crop-resize (and optionally
the superpixel patch-reduction) inside the jitted train step.

The reference hides ~2.6 ms/sample of host augmentation behind many
DataLoader workers (dataloaders/data_dataloaders.py:9-12; crop math in
rawimage_util.py:276-361).  A TPU-first pipeline can do what the torch one
cannot: keep the host's share to JPEG decode + crop-coordinate sampling and
run the resample on the MXU.  The host ships the decoded image padded into
a fixed (S, Wmax, 3) uint8 canvas plus integer crop-window coordinates; the
step computes per-sample PIL-semantics bicubic resampling weights and
applies them as two small matmuls:

    out[o, p, c] = sum_h sum_w Rv[o, h] * canvas[h, w, c] * Rh[p, w]

Weight semantics follow PIL's ImagingResample (antialiased bicubic,
a = -0.5): per output pixel the source center is  win0 + (o + 0.5) * scale,
the kernel is evaluated at (tap + 0.5 - center) / filterscale with
filterscale = max(scale, 1), taps limited to [int(center - support + .5),
int(center + support + .5)) clamped to the crop window (crop-then-resize
reads no pixels outside the window — data/transforms.py semantics), and
each row of weights normalized to sum 1.  PIL additionally quantizes
weights to 8.22 fixed point and clips the horizontal pass through uint8 —
a float path cannot reproduce that rounding bit-for-bit; the measured
device-vs-PIL pixel delta is asserted small in tests/test_device_aug.py.

Tall images are shipped TRANSPOSED (with swapped window coordinates) so a
single (S, Wmax) canvas covers both orientations; bicubic resampling is
separable and symmetric, so resample(imgᵀ)ᵀ == resample(img) exactly.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

BICUBIC_A = -0.5
SUPPORT = 2.0                     # PIL bicubic filter support


def _bicubic_kernel(x: jax.Array) -> jax.Array:
    """PIL's bicubic filter (a = -0.5), vectorized."""
    a = BICUBIC_A
    ax = jnp.abs(x)
    w1 = ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0
    w2 = (((ax - 5.0) * ax + 8.0) * ax - 4.0) * a
    return jnp.where(ax < 1.0, w1, jnp.where(ax < 2.0, w2, 0.0))


def resample_matrix(canvas_size: int, out_size: int, win0: jax.Array,
                    win_len: jax.Array) -> jax.Array:
    """(out_size, canvas_size) PIL-bicubic resampling weights for one axis.

    win0/win_len: scalar int32 — the crop window [win0, win0 + win_len)
    inside the canvas.  Rows are normalized to sum 1 (PIL's per-pixel
    coefficient normalization).
    """
    win0 = win0.astype(jnp.float32)
    win_len = win_len.astype(jnp.float32)
    scale = win_len / out_size
    filterscale = jnp.maximum(scale, 1.0)
    support = SUPPORT * filterscale

    o = jnp.arange(out_size, dtype=jnp.float32)[:, None]
    center = win0 + (o + 0.5) * scale
    taps = jnp.arange(canvas_size, dtype=jnp.float32)[None, :]

    w = _bicubic_kernel((taps + 0.5 - center) / filterscale)
    # PIL tap range: [int(center - support + .5), int(center + support + .5))
    # clamped to the window — implemented as a mask over the dense tap axis.
    lo = jnp.maximum(jnp.floor(center - support + 0.5), win0)
    hi = jnp.minimum(jnp.floor(center + support + 0.5), win0 + win_len)
    mask = (taps >= lo) & (taps < hi)
    w = jnp.where(mask, w, 0.0)
    return w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-8)


def crop_resize_one(canvas: jax.Array, window: jax.Array, out_size: int,
                    vertical_first: Optional[jax.Array] = None) -> jax.Array:
    """canvas (H, W, 3) uint8, window (4,) int32 = (j, i, w, h) →
    (out_size, out_size, 3) float32 in [0, 255].

    PIL resamples horizontally FIRST and materializes a rounded, clipped
    uint8 intermediate (ImagingResampleHorizontal_8bpc's clip8) — the
    bicubic kernel's negative lobes overshoot [0, 255] and the clipping is
    VISIBLE in the output (up to ~20/255 on noise images), so the two-pass
    round+clip must be reproduced, not approximated by one final clip.
    The clipped intermediate also breaks transpose symmetry: a TRANSPOSED
    canvas must run the canvas-vertical pass first (its vertical axis is
    the original's horizontal one) — `vertical_first` selects that order
    per sample.
    """
    h_canvas, w_canvas, _ = canvas.shape
    j, i, w, h = window[0], window[1], window[2], window[3]
    rv = resample_matrix(h_canvas, out_size, i, h)
    rh = resample_matrix(w_canvas, out_size, j, w)
    img = canvas.astype(jnp.float32)

    def clip8(x):
        return jnp.clip(jnp.round(x), 0.0, 255.0)

    out_h = clip8(jnp.einsum(
        "oh,hpc->opc", rv,
        clip8(jnp.einsum("hwc,pw->hpc", img, rh))))
    if vertical_first is None:
        return out_h
    out_v = clip8(jnp.einsum(
        "owc,pw->opc",
        clip8(jnp.einsum("oh,hwc->owc", rv, img)), rh))
    return jnp.where(vertical_first.astype(bool), out_v, out_h)


def crop_resize_batch(canvas: jax.Array, window: jax.Array,
                      transposed: jax.Array, out_size: int) -> jax.Array:
    """Batched device crop-resize with per-sample untranspose.

    canvas (B, S, Wmax, 3) uint8; window (B, 4) int32 (j, i, w, h) in
    canvas coordinates (already swapped for transposed samples);
    transposed (B,) int32 {0,1}.  Returns (B, out_size, out_size, 3) f32
    pixels in [0, 255].
    """
    out = jax.vmap(
        lambda c, w, t: crop_resize_one(c, w, out_size, vertical_first=t)
    )(canvas, window, transposed)
    flipped = jnp.transpose(out, (0, 2, 1, 3))
    return jnp.where(transposed[:, None, None, None].astype(bool),
                     flipped, out)


def yuv420_to_rgb(y: jax.Array, cbcr: jax.Array) -> jax.Array:
    """Device-side inverse of data.transforms.rgb_to_yuv420.

    y: (B, H, W) uint8; cbcr: (B, H/2, W/2, 2) uint8 → (B, H, W, 3) f32
    pixels in [0, 255]. Chroma is upsampled bilinearly (libjpeg's "fancy"
    triangle upsampling — closer to the original decode than nearest) and
    converted with the exact JFIF inverse matrix.
    """
    b, h, w = y.shape
    cb = cbcr[..., 0].astype(jnp.float32) - 128.0
    cr = cbcr[..., 1].astype(jnp.float32) - 128.0
    cb = jax.image.resize(cb, (b, h, w), method="linear")
    cr = jax.image.resize(cr, (b, h, w), method="linear")
    yf = y.astype(jnp.float32)
    r = yf + 1.402 * cr
    g = yf - 0.344136 * cb - 0.714136 * cr
    bch = yf + 1.772 * cb
    return jnp.clip(jnp.stack([r, g, bch], axis=-1), 0.0, 255.0)


def superpixel_patch_reduce_one(seg_canvas: jax.Array, window: jax.Array,
                                img_size: int, patch: int) -> jax.Array:
    """Device equivalent of data/superpixel.crop_seg_from_cache (no-flip
    path): nearest-resize the window to img_size² then integer-mean ids
    per (patch × patch) tile.  seg_canvas (H, W) int32; window (4,) int32
    (j, i, w, h).  Returns (img_size // patch,)² int32.
    """
    j, i, w, h = window[0], window[1], window[2], window[3]
    d = jnp.arange(img_size)
    # torch F.interpolate(mode='nearest'): src = floor(dst * in / out)
    ys = i + (d * h) // img_size
    xs = j + (d * w) // img_size
    resized = seg_canvas[ys[:, None], xs[None, :]]
    g = img_size // patch
    tiles = resized.reshape(g, patch, g, patch)
    sums = jnp.sum(tiles.astype(jnp.int64), axis=(1, 3))
    return (sums // (patch * patch)).astype(jnp.int32)


def superpixel_patch_reduce_batch(seg_canvas: jax.Array, window: jax.Array,
                                  transposed: jax.Array, img_size: int,
                                  patch: int) -> jax.Array:
    out = jax.vmap(lambda s, w: superpixel_patch_reduce_one(
        s, w, img_size, patch))(seg_canvas.astype(jnp.int32), window)
    return jnp.where(transposed[:, None, None].astype(bool),
                     jnp.transpose(out, (0, 2, 1)), out)
