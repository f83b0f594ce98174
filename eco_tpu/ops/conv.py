"""Channels-last ND convolution for TPU.

Replaces the reference's im2col/cuDNN convolution stack
(``src/caffe/layers/{base_conv_layer,conv_layer,cudnn_conv_layer}.{cpp,cu}``,
``util/im2col.cpp:91-269``) with ``lax.conv_general_dilated`` in NHWC/NDHWC
layout so XLA tiles directly onto the MXU.  Weight layout is HWIO (2D) /
DHWIO (3D): contiguous in the input-channel/lane dims the MXU wants.

Caffe semantics preserved:
- per-axis ``kernel_size/stride/pad/dilation`` repeated fields
  (caffe.proto:506-555), broadcast from scalars;
- grouped convolution via ``feature_group_count``;
- output dim ``floor((in + 2p - k)/s) + 1`` == XLA explicit (p, p) padding;
- optional bias.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from eco_tpu.utils.shapes import normalize_spatial_param

_DIMNUMS = {
    1: ("NWC", "WIO", "NWC"),
    2: ("NHWC", "HWIO", "NHWC"),
    3: ("NDHWC", "DHWIO", "NDHWC"),
}


def conv_nd(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride=1,
    pad=0,
    dilation=1,
    groups: int = 1,
    transposed: bool = False,
    accum_dtype=jnp.float32,
) -> jax.Array:
    """ND convolution on a channels-last tensor.

    ``x``: (N, *spatial, C_in); ``w``: (*spatial_k, C_in/groups, C_out).
    Accumulates in ``accum_dtype`` (f32 on the MXU even for bf16 inputs) and
    casts back to ``x.dtype``.
    """
    num_spatial = x.ndim - 2
    if w.dtype != x.dtype:
        w = w.astype(x.dtype)  # keep MXU inputs homogeneous (bf16 policy)
    # NOTE: no preferred_element_type=f32 upcast here.  The TPU MXU already
    # accumulates bf16 convolutions in f32 internally, and an explicit f32
    # output dtype breaks the conv VJP under bf16 (mixed-dtype transpose
    # rule) -- the bf16 training path needs grad(conv(bf16)) to work.
    del accum_dtype
    stride = normalize_spatial_param(stride, num_spatial, default=1)
    pad = normalize_spatial_param(pad, num_spatial, default=0)
    dilation = normalize_spatial_param(dilation, num_spatial, default=1)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, _DIMNUMS[num_spatial])
    padding = [(p, p) for p in pad]
    if transposed:
        # Deconvolution with exact Caffe/torch ConvTranspose semantics
        # (output = s*(in-1) + k_ext - 2p): a fractionally-strided conv of
        # the lhs-dilated input with the spatially-flipped kernel and
        # padding k_ext-1-p per side.  ``w`` is (*k, C_in, C_out/g) where
        # C_in = the deconv's input channels (mirrors Caffe's deconv blob
        # (C_in, C_out/g, *k), base_conv_layer.cpp:13-188 with channel
        # roles swapped by deconv_layer.cpp).
        if groups != 1:
            # Group i maps input block i -> output block i.  XLA's grouped
            # conv (feature_group_count=g, HWIO) wants (*k, C_in/g, C_out)
            # with output blocks consuming consecutive input groups, so
            # rearrange (*k, [g, C_in/g], C_out/g) -> (*k, C_in/g, [g, C_out/g]).
            k_sp = w.shape[:num_spatial]
            cin, cout_pg = w.shape[-2], w.shape[-1]
            w = w.reshape(*k_sp, groups, cin // groups, cout_pg)
            w = jnp.swapaxes(w, -3, -2)
            w = w.reshape(*k_sp, cin // groups, groups * cout_pg)
        w_rev = jnp.flip(w, axis=tuple(range(num_spatial)))
        pad_t = [
            (dilation[i] * (w.shape[i] - 1) - pad[i],) * 2
            for i in range(num_spatial)
        ]
        y = lax.conv_general_dilated(
            x,
            w_rev,
            window_strides=(1,) * num_spatial,
            padding=pad_t,
            lhs_dilation=stride,
            rhs_dilation=dilation,
            dimension_numbers=dn,
            feature_group_count=groups,
        )
    else:
        y = lax.conv_general_dilated(
            x,
            w,
            window_strides=stride,
            padding=padding,
            rhs_dilation=dilation,
            dimension_numbers=dn,
            feature_group_count=groups,
        )
    y = y.astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv2d(x, w, b=None, *, stride=1, pad=0, dilation=1, groups=1):
    assert x.ndim == 4, x.shape
    return conv_nd(x, w, b, stride=stride, pad=pad, dilation=dilation, groups=groups)


def conv3d(x, w, b=None, *, stride=1, pad=0, dilation=1, groups=1):
    assert x.ndim == 5, x.shape
    return conv_nd(x, w, b, stride=stride, pad=pad, dilation=dilation, groups=groups)
