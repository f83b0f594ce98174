"""Caffe-semantics ND pooling on channels-last tensors.

Replaces the reference pooling stack
(``src/caffe/layers/pooling_layer.{cpp,cu}``, ``cudnn_pooling_layer.cpp``)
with ``lax.reduce_window``.  Caffe specifics reproduced exactly:

- **ceil-mode output dims** with the "last window must start inside the
  padded image" clip (pooling_layer.cpp:84-111) -- implemented by computing
  the required asymmetric high padding statically;
- **AVE divisor** = window area clipped to the *padded* extent
  (pooling_layer.cpp:156-164), so border zeros count in the denominator;
  computed as a static per-position divisor grid (outer product of per-axis
  divisors), so the TPU sees one multiply by a constant plane;
- MAX pads with -inf (windows never extend past ``in + pad`` thanks to the
  clip, matching Caffe's clip-to-image max);
- ``global_pooling`` (kernel = whole spatial extent, e.g. the ECO ``[4,7,7]``
  3D head pool, ECO_Lite.prototxt:1833-1842);
- ND: any number of spatial axes (2D Inception pools, 3D head pool, and the
  (16,1) segment-consensus pool of ECO-Full, ECO_full.prototxt:4803).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from eco_tpu.utils.shapes import (
    caffe_avg_pool_divisors,
    caffe_pool_out_dim,
    normalize_spatial_param,
)


def pool_nd(
    x: jax.Array,
    *,
    kernel=None,
    stride=1,
    pad=0,
    mode: str = "max",
    global_pooling: bool = False,
) -> jax.Array:
    """Pool over the spatial axes of a channels-last (N, *spatial, C) tensor."""
    num_spatial = x.ndim - 2
    spatial = x.shape[1:-1]
    if global_pooling:
        kernel = spatial
        stride = (1,) * num_spatial
        pad = (0,) * num_spatial
    kernel = normalize_spatial_param(kernel, num_spatial)
    stride = normalize_spatial_param(stride, num_spatial, default=1)
    pad = normalize_spatial_param(pad, num_spatial, default=0)

    pad_cfg = []
    divisors = []
    for size, k, s, p in zip(spatial, kernel, stride, pad):
        out, pad_hi = caffe_pool_out_dim(size, k, s, p)
        pad_cfg.append((p, pad_hi))
        divisors.append(caffe_avg_pool_divisors(size, k, s, p))

    window = (1,) + tuple(kernel) + (1,)
    strides = (1,) + tuple(stride) + (1,)
    padding = [(0, 0)] + pad_cfg + [(0, 0)]

    mode = mode.lower()
    if mode == "max":
        if os.environ.get("ECO_PALLAS_POOL") == "1":
            from eco_tpu.ops.pallas import poolfuse

            # floating only: the kernel's clipped-window fill is a float
            # -inf surrogate, undefined when cast to integer dtypes
            if (jnp.issubdtype(x.dtype, jnp.floating)
                    and poolfuse.supports(x.shape, kernel, stride, pad, mode)
                    and jax.default_backend() == "tpu"):
                return poolfuse.fused_maxpool_3x3s2(x)
        if jnp.issubdtype(x.dtype, jnp.floating):
            if os.environ.get("ECO_POOL_MASK_VJP") == "1":
                return _maxpool_mask_vjp(x, tuple(kernel), tuple(stride),
                                         tuple(pad_cfg))
            init = -jnp.inf
        else:  # e.g. int8 inside a quantized chain: typed identity element
            init = x.dtype.type(jnp.iinfo(x.dtype).min)
        return lax.reduce_window(x, init, lax.max, window, strides, padding)
    if mode in ("ave", "avg", "mean"):
        acc = lax.reduce_window(
            x.astype(jnp.float32), 0.0, lax.add, window, strides, padding
        )
        div = np.ones([len(d) for d in divisors], dtype=np.float32)
        for axis, d in enumerate(divisors):
            shape = [1] * num_spatial
            shape[axis] = len(d)
            div = div * np.asarray(d, dtype=np.float32).reshape(shape)
        div = jnp.asarray(div.reshape((1,) + div.shape + (1,)))
        return (acc / div).astype(x.dtype)
    raise ValueError(
        f"unknown pool mode {mode!r} (use stochastic_pool for STOCHASTIC)"
    )


import functools
import itertools


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _maxpool_mask_vjp(x, kernel, stride, pad_cfg):
    """MAX pool whose VJP recomputes argmax masks instead of lowering to
    XLA's select-and-scatter (measured 4-5x the forward cost on v5e,
    docs/PERF_NOTES.md).  Backward = K dense shifted adds, no scatter:
    for each in-window offset o, the windows claiming their max at o
    contribute their cotangent there; first-match claim ordering (row-major
    offsets) reproduces Caffe's single-argmax routing
    (pooling_layer.cpp MAX backward) including ties, e.g. the many exact
    zeros after ReLU.  Opt-in via ECO_POOL_MASK_VJP=1."""
    return _maxpool_fwd_raw(x, kernel, stride, pad_cfg)


def _maxpool_fwd_raw(x, kernel, stride, pad_cfg):
    window = (1,) + tuple(kernel) + (1,)
    strides = (1,) + tuple(stride) + (1,)
    padding = [(0, 0)] + list(pad_cfg) + [(0, 0)]
    return lax.reduce_window(x, -jnp.inf, lax.max, window, strides, padding)


def _maxpool_mask_fwd(x, kernel, stride, pad_cfg):
    y = _maxpool_fwd_raw(x, kernel, stride, pad_cfg)
    return y, (x, y)


def _maxpool_mask_bwd(kernel, stride, pad_cfg, res, g):
    x, y = res
    nsp = x.ndim - 2
    neg = x.dtype.type(-jnp.inf)
    xpad = jnp.pad(
        x, [(0, 0)] + list(pad_cfg) + [(0, 0)], constant_values=neg
    )
    out_sp = y.shape[1:-1]
    gz = g.dtype.type(0)
    claimed = jnp.zeros(y.shape, bool)
    gx_pad = None
    for o in itertools.product(*[range(k) for k in kernel]):
        limit = [o[d] + (out_sp[d] - 1) * stride[d] + 1 for d in range(nsp)]
        xs = lax.slice(
            xpad,
            (0,) + tuple(o) + (0,),
            (x.shape[0],) + tuple(limit) + (xpad.shape[-1],),
            (1,) + tuple(stride) + (1,),
        )
        eq = xs == y
        contrib = jnp.where(eq & ~claimed, g, gz)
        claimed = claimed | eq
        # place contrib at offset o with stride-1 interior zeros: the exact
        # adjoint of the strided slice above, as one dense pad (no scatter)
        cfg = [(0, 0, 0)] + [
            (o[d], xpad.shape[1 + d] - limit[d], stride[d] - 1)
            for d in range(nsp)
        ] + [(0, 0, 0)]
        term = lax.pad(contrib, gz, cfg)
        gx_pad = term if gx_pad is None else gx_pad + term
    # strip the forward padding
    slc = [slice(None)] + [
        slice(lo, gx_pad.shape[1 + d] - hi)
        for d, (lo, hi) in enumerate(pad_cfg)
    ] + [slice(None)]
    return (gx_pad[tuple(slc)],)


_maxpool_mask_vjp.defvjp(_maxpool_mask_fwd, _maxpool_mask_bwd)


def extract_pool_windows(x: jax.Array, kernel, stride) -> jax.Array:
    """(N, *spatial, C) -> (N, *out, C, K) window view, K = prod(kernel).

    Windows start at ``i*stride`` with NO padding (the reference stochastic
    kernels index ``hstart = ph*stride``, clipping at the border); border
    windows are filled with zeros, which both pooling modes below treat as
    absent (zero mass / zero contribution), matching the reference clip.
    Offsets are ordered row-major (i*kw + j), the Caffe im2col order.
    """
    from eco_tpu.ops.layout import extract_windows

    num_spatial = x.ndim - 2
    kernel = normalize_spatial_param(kernel, num_spatial)
    stride = normalize_spatial_param(stride, num_spatial, default=1)
    spatial = x.shape[1:-1]
    outs = [caffe_pool_out_dim(size, k, s, 0)[0]
            for size, k, s in zip(spatial, kernel, stride)]
    need = [max(0, (o - 1) * s + k - size)
            for o, s, k, size in zip(outs, stride, kernel, spatial)]
    if any(need):
        x = jnp.pad(x, [(0, 0)] + [(0, n) for n in need] + [(0, 0)])
    return extract_windows(x, kernel, stride, outs)  # (N, *out, C, K)


def stochastic_pool(x: jax.Array, kernel, stride=1, *, train: bool,
                    rng: jax.Array | None = None) -> jax.Array:
    """STOCHASTIC pooling (pooling_layer.cu StoPoolForwardTrain/Test).

    TRAIN: sample one activation per window with probability proportional to
    its value (the reference draws u*sum and scans the cumsum; the Gumbel-max
    over log(x) here samples the identical multinomial, vectorized for the
    VPU instead of a sequential scan).  Assumes non-negative activations
    (post-ReLU), as the method requires.
    TEST: the probability-weighted average sum(x^2) / (FLT_MIN + sum(x)).
    Padding is not supported (the reference GPU kernels ignore pad).
    """
    windows = extract_pool_windows(x, kernel, stride)  # (N, *out, C, K)
    wf = windows.astype(jnp.float32)
    if not train:
        num = jnp.sum(jnp.square(wf), axis=-1)
        den = jnp.sum(wf, axis=-1) + np.finfo(np.float32).tiny
        return (num / den).astype(x.dtype)
    if rng is None:
        raise ValueError("stochastic_pool(train=True) needs an rng key")
    logits = jnp.log(jnp.maximum(wf, 0.0))  # zeros -> -inf: never sampled
    g = jax.random.gumbel(rng, wf.shape, jnp.float32)
    pick = jnp.argmax(logits + g, axis=-1)
    y = jnp.take_along_axis(windows, pick[..., None], axis=-1)[..., 0]
    return y.astype(x.dtype)


def max_pool(x, kernel, stride=1, pad=0):
    return pool_nd(x, kernel=kernel, stride=stride, pad=pad, mode="max")


def avg_pool(x, kernel, stride=1, pad=0):
    return pool_nd(x, kernel=kernel, stride=stride, pad=pad, mode="ave")


def global_avg_pool(x, keepdims: bool = False):
    """Global spatial mean -- the (4,7,7) head pool collapses to one mean."""
    axes = tuple(range(1, x.ndim - 1))
    return jnp.mean(x, axis=axes, keepdims=keepdims, dtype=jnp.float32).astype(x.dtype)


def roi_max_pool(x: jax.Array, rois: jax.Array, *, pooled_h: int,
                 pooled_w: int, spatial_scale: float = 1.0) -> jax.Array:
    """Fast R-CNN ROI max pooling (roi_pooling_layer.cpp:28-130).

    ``x``: (N, H, W, C) channels-last feature map; ``rois``: (R, 5) rows of
    ``[batch_index, x1, y1, x2, y2]`` in input-image coordinates (scaled by
    ``spatial_scale`` onto the feature map, rounded).  Each ROI is divided
    into a ``pooled_h x pooled_w`` grid of bins with
    ``start = floor(p*bin), end = ceil((p+1)*bin)`` and max-pooled; empty
    bins emit 0.

    TPU-native formulation: the reference's per-bin scalar loops become two
    separable masked-max contractions (rows then columns) under ``vmap``
    over ROIs -- bin extents are traced VALUES (not shapes), so the whole
    thing jits with a static (R, pooled_h, pooled_w, C) output.
    """
    n, h, w, c = x.shape
    rf = rois.astype(jnp.float32)
    batch_idx = rois[:, 0].astype(jnp.int32)

    def _round(v):  # C round(): half away from zero (jnp.round is banker's)
        return jnp.sign(v) * jnp.floor(jnp.abs(v) + 0.5)

    start_w = _round(rf[:, 1] * spatial_scale)
    start_h = _round(rf[:, 2] * spatial_scale)
    end_w = _round(rf[:, 3] * spatial_scale)
    end_h = _round(rf[:, 4] * spatial_scale)
    roi_h = jnp.maximum(end_h - start_h + 1.0, 1.0)
    roi_w = jnp.maximum(end_w - start_w + 1.0, 1.0)

    def bin_masks(start, size, pooled, extent):
        """(pooled, extent) bool mask of positions inside each bin."""
        p = jnp.arange(pooled, dtype=jnp.float32)
        bin_size = size / pooled
        lo = jnp.floor(p * bin_size) + start           # inclusive
        hi = jnp.ceil((p + 1.0) * bin_size) + start    # exclusive
        lo = jnp.clip(lo, 0.0, float(extent))
        hi = jnp.clip(hi, 0.0, float(extent))
        pos = jnp.arange(extent, dtype=jnp.float32)
        return (pos[None, :] >= lo[:, None]) & (pos[None, :] < hi[:, None])

    neg = jnp.asarray(-jnp.inf, jnp.float32)

    def one_roi(b, sh, rh, sw, rw):
        feat = x[b].astype(jnp.float32)                      # (H, W, C)
        mh = bin_masks(sh, rh, pooled_h, h)                  # (PH, H)
        mw = bin_masks(sw, rw, pooled_w, w)                  # (PW, W)
        rows = jnp.max(
            jnp.where(mh[:, :, None, None], feat[None], neg), axis=1
        )                                                    # (PH, W, C)
        out = jnp.max(
            jnp.where(mw[None, :, :, None], rows[:, None], neg), axis=2
        )                                                    # (PH, PW, C)
        return jnp.where(jnp.isfinite(out), out, 0.0)        # empty bin -> 0

    out = jax.vmap(one_roi)(batch_idx, start_h, roi_h, start_w, roi_w)
    return out.astype(x.dtype)
