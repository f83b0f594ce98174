"""int8 quantized serving kernels: per-channel weights, calibrated activations.

The reference has no quantized inference (Caffe's serving path is f32
throughout); this is a TPU-native extension.  The v5e MXU runs int8 x int8
-> int32 matmuls/convs at ~2x the bf16 rate, so a serving-only w8a8 path is
the next throughput lever once bf16 is MXU-bound.

Scheme (standard symmetric post-training quantization):

- weights: per-output-channel symmetric int8, ``s_w[c] = max|w[..,c]| / 127``
  (folded-BN weights, so conv outputs are directly comparable to f32);
- activations: per-tensor symmetric int8 with a *calibrated* static scale
  ``s_x = max|x| / 127`` measured on representative batches
  (eco_tpu.convert.quantize.calibrate);
- compute: ``conv(int8, int8) -> int32``; the result is rescaled by
  ``s_x * s_w[c]`` back to the float compute dtype, bias added in float.
  Inter-layer tensors stay bf16/f32 -- only the MXU sees int8 -- so every
  surrounding op (pool, relu, consensus) is untouched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from eco_tpu.ops.conv import _DIMNUMS
from eco_tpu.utils.shapes import normalize_spatial_param


def quantize_weight(w: jax.Array, *, axis: int = -1):
    """Per-output-channel symmetric int8: returns (w_q, scale).

    ``scale`` has the shape of ``w``'s ``axis`` extent; zero channels get
    scale 1 (their quantized weights are all-zero anyway).
    """
    red = tuple(i for i in range(w.ndim) if i != (axis % w.ndim))
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=red)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    shape = [1] * w.ndim
    shape[axis % w.ndim] = -1
    w_q = jnp.clip(
        jnp.round(w.astype(jnp.float32) / scale.reshape(shape)), -127, 127
    ).astype(jnp.int8)
    return w_q, scale


def quantize_act(x: jax.Array, scale: float) -> jax.Array:
    """Per-tensor symmetric int8 with a static (calibrated) scale."""
    return jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale), -127, 127
    ).astype(jnp.int8)


def _epilogue(y, scale_vec, b, *, out_scale, out_dtype):
    """Shared dequant/requant tail: int32 accumulator -> float (dequant by
    ``scale_vec`` per channel, + bias), then either cast to ``out_dtype``
    (chain end) or REQUANTIZE to int8 at ``out_scale`` (int8 chain: the next
    consumer is also quantized, so the bf16 round trip through HBM is
    skipped entirely -- VERDICT r3 #3)."""
    y = y.astype(jnp.float32) * scale_vec
    if b is not None:
        y = y + b.astype(jnp.float32)
    if out_scale is not None:
        return jnp.clip(jnp.round(y / out_scale), -127, 127).astype(jnp.int8)
    return y.astype(out_dtype)


def conv_nd_int8(
    x: jax.Array,
    w_q: jax.Array,
    w_scale: jax.Array,
    b: jax.Array | None = None,
    *,
    act_scale: float,
    stride=1,
    pad=0,
    dilation=1,
    groups: int = 1,
    out_scale: float | None = None,
    out_dtype=None,
) -> jax.Array:
    """Quantized ND conv: int8 on the MXU, float OR int8 at the edges.

    ``x``: float (N, *spatial, C_in) -- quantized here at ``act_scale`` --
    or already int8 (an upstream quantized layer emitted it at
    ``act_scale``; quantization is skipped).  ``w_q``: int8
    (*k, C_in/g, C_out); ``w_scale``: f32 (C_out,).  Layout matches
    ops.conv_nd exactly (base_conv_layer.cpp geometry), forward convs only.
    ``out_scale`` set -> int8 output at that scale (see _epilogue).
    """
    num_spatial = x.ndim - 2
    if x.dtype == jnp.int8:
        x_q = x
        out_dtype = out_dtype or jnp.float32
    else:
        out_dtype = out_dtype or x.dtype
        x_q = quantize_act(x, act_scale)
    stride = normalize_spatial_param(stride, num_spatial, default=1)
    pad = normalize_spatial_param(pad, num_spatial, default=0)
    dilation = normalize_spatial_param(dilation, num_spatial, default=1)
    dn = lax.conv_dimension_numbers(x.shape, w_q.shape, _DIMNUMS[num_spatial])
    y = lax.conv_general_dilated(
        x_q,
        w_q,
        window_strides=stride,
        padding=[(p, p) for p in pad],
        rhs_dilation=dilation,
        dimension_numbers=dn,
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    return _epilogue(
        y, act_scale * w_scale.astype(jnp.float32), b,
        out_scale=out_scale, out_dtype=out_dtype,
    )


def inner_product_int8(
    x: jax.Array,
    w_q: jax.Array,
    w_scale: jax.Array,
    b: jax.Array | None = None,
    *,
    act_scale: float,
    out_scale: float | None = None,
    out_dtype=None,
) -> jax.Array:
    """Quantized (N, Din) x (Din, Dout) matmul, int8 MXU; edge dtypes as
    conv_nd_int8."""
    if x.dtype == jnp.int8:
        x_q = x
        out_dtype = out_dtype or jnp.float32
    else:
        out_dtype = out_dtype or x.dtype
        x_q = quantize_act(x, act_scale)
    y = lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return _epilogue(
        y, act_scale * w_scale.astype(jnp.float32), b,
        out_scale=out_scale, out_dtype=out_dtype,
    )
