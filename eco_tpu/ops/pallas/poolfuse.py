"""Experimental fused (affine+)ReLU+3x3/s2 max-pool Pallas kernel.

Replaces the reference's pooling_layer.cu for the ceil-mode 3x3 stride-2
max pools of BN-Inception (pool1 112->56 C=64, pool2 56->28 C=192, the
inception 3c/4e downsample pools) with a single-pass VMEM kernel.

Design: the (N, H, W, C) input is viewed as (N, H, W/2, 2C) BEFORE the
kernel -- same memory bytes, so the reshape is free in XLA -- which turns
column parity into a lane subrange and row parity into an untiled-dim
split.  In-kernel the 3x3/s2 ceil-mode max is then 4 maxima over plain
slices (no vector shape casts, which Mosaic cannot lower).  Zero padding
is correct for the clipped last window because the kernel only runs after
a ReLU (values >= 0); the plain variant uses -inf fill.

STATUS (v5e, 2026-08-17, batch 1536 frames): numerically exact vs
lax.reduce_window but ~3x SLOWER -- 27.2 ms vs XLA's 8.6 ms for pool1 and
19.5 vs 5.8 ms for pool2, invariant to images-per-step (G=1..8), i.e.
VPU/relayout-bound, not DMA- or overhead-bound.  XLA's reduce_window is
the production path; this kernel is kept (a) as the measured record of
the VERDICT round-1 item-5 experiment, (b) because only the lane-subrange
extracts separate it from the memory floor (~3.9 ms) if Mosaic learns to
fold them.  Opt in with ECO_PALLAS_POOL=1 (pool_nd consults it).

Reference semantics being matched: pooling_layer.cpp:84-111 (ceil mode +
last-window clip); see eco_tpu/ops/pool.py for the production XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(y_ref, sc_ref, sh_ref, o_ref, *, G, H, W, C, affine, relu):
    z = y_ref[0]                                       # (G, H, W/2, 2C)
    if affine:
        z = z.astype(jnp.float32) * sc_ref[0] + sh_ref[0]
    if relu or affine:
        z = jnp.maximum(z, jnp.zeros((), z.dtype))
        fill = jnp.zeros((), z.dtype)
    else:
        fill = jnp.asarray(-3.0e38, jnp.float32).astype(z.dtype)
    ho, wo = H // 2, W // 2
    z5 = z.reshape(G, ho, 2, wo, 2 * C)                # untiled split: free
    r0, r1 = z5[:, :, 0], z5[:, :, 1]
    r2 = jnp.concatenate(
        [r0[:, 1:], jnp.full((G, 1, wo, 2 * C), fill, r0.dtype)], 1)
    m = jnp.maximum(r0, jnp.maximum(r1, r2))           # rows pooled
    c0, c1 = m[..., 0:C], m[..., C:2 * C]
    c2 = jnp.concatenate(
        [m[:, :, 1:, 0:C], jnp.full((G, ho, 1, C), fill, m.dtype)], 2)
    o_ref[0] = jnp.maximum(c0, jnp.maximum(c1, c2)).astype(o_ref.dtype)


def supports(x_shape, kernel, stride, pad, mode: str) -> bool:
    """True iff fused_maxpool_3x3s2 implements this pooling config."""
    if len(x_shape) != 4 or mode.lower() != "max":
        return False
    n, h, w, c = x_shape
    return (
        tuple(kernel) == (3, 3) and tuple(stride) == (2, 2)
        and tuple(pad) == (0, 0) and h % 2 == 0 and w % 2 == 0 and w >= 4
    )


@functools.partial(
    jax.jit,
    static_argnames=("affine", "relu", "images_per_step", "interpret"))
def fused_maxpool_3x3s2(
    y: jax.Array,
    scale: jax.Array | None = None,
    shift: jax.Array | None = None,
    *,
    affine: bool = False,
    relu: bool = False,
    images_per_step: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """Ceil-mode 3x3/s2 max pool of (N, H, W, C), H and W even.

    ``affine``: apply per-channel f32 scale/shift (+ReLU) first -- the
    unfolded inference BN epilogue.  ``relu``: plain ReLU first.
    """
    n, h, w, c = y.shape
    g = images_per_step
    while n % g:
        g //= 2
    yv = y.reshape(n // g, g, h, w // 2, 2 * c)        # free bitcast
    if scale is None:
        sc = sh = jnp.zeros((1, 2 * c), jnp.float32)
    else:
        sc = jnp.tile(scale.astype(jnp.float32), 2).reshape(1, -1)
        sh = jnp.tile(shift.astype(jnp.float32), 2).reshape(1, -1)
    out = pl.pallas_call(
        functools.partial(
            _kernel, G=g, H=h, W=w, C=c, affine=affine, relu=relu),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((1, g, h, w // 2, 2 * c), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, h // 2, w // 2, c),
                               lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // g, g, h // 2, w // 2, c),
                                       y.dtype),
        interpret=interpret,
        **({} if interpret else {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)}),
    )(yv, sc, sh)
    return out.reshape(n, h // 2, w // 2, c)
