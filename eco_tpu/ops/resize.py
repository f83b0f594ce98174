"""On-device dynamic crop + bilinear resize -- multi-scale augmentation for
the raw-uint8 data plane.

The reference's multi-scale augmentation crops a sampled (crop_h, crop_w)
window and cv2-resizes it to the net input (data_transformer.cpp:83-144,
255-268).  On host that is a per-frame OpenCV call; on TPU a *dynamic* crop
size would be a dynamic shape -- forbidden under jit.  The trick: separable
bilinear interpolation IS a pair of matrix multiplies.  For each video we
build row/column interpolation matrices R (cs x H) and C (cs x W) from the
traced (offset, size) scalars -- two one-hots blended by the fractional
weight -- and compute ``out = R @ frame @ C^T`` batched over frames.  Crop
and resize fuse into two MXU matmuls with fully static shapes; a different
(crop_h, crop_w) per video is just different matrix *values*.

Coordinate convention matches cv2.resize INTER_LINEAR (half-pixel centers,
edge clamp), so outputs agree with the host transform within OpenCV's
fixed-point rounding.  When (crop_h, crop_w) == (cs, cs) the matrices
degenerate to shifted identities and the op is an exact crop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interp_matrix(offset, size, full: int, out_size: int) -> jax.Array:
    """(out_size, full) bilinear sampling matrix for a window of traced
    ``size`` starting at traced ``offset`` inside a length-``full`` axis."""
    i = jnp.arange(out_size, dtype=jnp.float32)
    # cv2 half-pixel rule: src = (dst + 0.5) * size/out - 0.5, edge-clamped
    y = (i + 0.5) * size.astype(jnp.float32) / out_size - 0.5
    y0 = jnp.floor(y)
    frac = y - y0
    lo = jnp.clip(y0.astype(jnp.int32), 0, size - 1)
    hi = jnp.clip(y0.astype(jnp.int32) + 1, 0, size - 1)
    # callers must keep offset+size <= full (the pipelines' samplers do);
    # clamp to the image edge anyway so a stray window degrades to border
    # replication instead of silent zero rows (one_hot of an OOB index)
    lo = jnp.clip(offset + lo, 0, full - 1)
    hi = jnp.clip(offset + hi, 0, full - 1)
    return (
        jax.nn.one_hot(lo, full, dtype=jnp.float32) * (1.0 - frac)[:, None]
        + jax.nn.one_hot(hi, full, dtype=jnp.float32) * frac[:, None]
    )


def crop_resize(
    frames: jax.Array,  # (N, S, H, W, C) uint8 or float
    h_off: jax.Array,   # (N,) int32
    w_off: jax.Array,   # (N,) int32
    crop_h: jax.Array,  # (N,) int32 sampled window height
    crop_w: jax.Array,  # (N,) int32 sampled window width
    *,
    out_size: int,
) -> jax.Array:
    """Per-video crop of (crop_h, crop_w) at (h_off, w_off), bilinearly
    resized to (out_size, out_size).  Returns float32 (N, S, cs, cs, C)."""
    n, s, h, w, c = frames.shape
    f = frames.astype(jnp.float32)

    def one(img, ho, wo, ch, cw):
        R = interp_matrix(ho, ch, h, out_size)  # (cs, H)
        C = interp_matrix(wo, cw, w, out_size)  # (cs, W)
        # HIGHEST: default MXU precision truncates f32 to bf16, ~±2 gray
        # levels at 255 scale; these matmuls are ~0.2% of model FLOPs, so
        # buy exact cv2-parity augmentation instead
        rows = jnp.einsum("oh,shwc->sowc", R, img,
                          precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("pw,sowc->sopc", C, rows,
                          precision=jax.lax.Precision.HIGHEST)

    return jax.vmap(one)(f, h_off, w_off, crop_h, crop_w)


def preprocess_resize_on_device(
    frames_u8: jax.Array,  # (N, S, H, W, 3) uint8 BGR
    h_off: jax.Array,
    w_off: jax.Array,
    crop_h: jax.Array,
    crop_w: jax.Array,
    mirror: jax.Array,  # (N,) bool
    *,
    crop: int = 224,
    mean=(104.0, 117.0, 123.0),
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Multi-scale analogue of pallas.preprocess_on_device: raw uint8 in,
    model-ready clips out, with the sampled-window resize done on-chip."""
    clips = crop_resize(
        frames_u8, h_off.astype(jnp.int32), w_off.astype(jnp.int32),
        crop_h.astype(jnp.int32), crop_w.astype(jnp.int32), out_size=crop,
    )
    flipped = clips[:, :, :, ::-1, :]
    clips = jnp.where(mirror[:, None, None, None, None], flipped, clips)
    meanv = jnp.asarray(mean, jnp.float32)
    return ((clips - meanv)).astype(out_dtype)
