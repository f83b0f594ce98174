"""Batch normalization: frozen / train / sync variants + folding math.

Covers all three reference BN flavors with one channels-last implementation:

- Caffe-engine BN (``src/caffe/layers/bn_layer.cpp``): 4 blobs
  (slope=gamma, bias=beta, running mean, running var); train mode computes
  biased batch moments over every axis but the channel, EMA-updates the
  running stats with ``running = (1-momentum)*batch + momentum*running``
  (bn_layer.cpp:120-121,155-156, momentum default 0.9, eps 1e-5,
  caffe.proto:466-474);
- cuDNN spatial BN over ND tensors (``cudnn_bn_layer.cpp:34-93``) -- the one
  ECO actually uses; identical math, works on 5D here because channels-last
  broadcasting is rank-agnostic;
- ``frozen`` mode: running stats are used even in TRAIN and gamma/beta get no
  gradient (caffe.proto:471-474) -- the *caller* (solver lr_mult=0) freezes
  the params; the op only switches the statistics source;
- SyncBN (``sync_bn_layer.cu:132-218``): per-shard moments are averaged
  across the mesh with ``lax.pmean`` before normalizing, which is exactly
  the reference's allreduce of E[x], E[x^2] with count N*H*W*world.

Inference-time folding (gen_bn_inference.py parity) lives in
:func:`fold_scale_shift` / :mod:`eco_tpu.convert.load`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

DEFAULT_EPS = 1e-5
DEFAULT_MOMENTUM = 0.9


def bn_inference(x, gamma, beta, mean, var, *, eps: float = DEFAULT_EPS):
    """y = gamma * (x - mean) / sqrt(var + eps) + beta, channel = last axis.

    Precomputes (scale, shift) in f32 so the per-element work is a single
    fused multiply-add regardless of rank (4D trunk or 5D head tensors).
    """
    scale = gamma.astype(jnp.float32) * lax.rsqrt(var.astype(jnp.float32) + eps)
    shift = beta.astype(jnp.float32) - mean.astype(jnp.float32) * scale
    return (x.astype(jnp.float32) * scale + shift).astype(x.dtype)


def bn_train(
    x,
    gamma,
    beta,
    running_mean,
    running_var,
    *,
    eps: float = DEFAULT_EPS,
    momentum: float = DEFAULT_MOMENTUM,
    axis_name: Optional[str] = None,
):
    """Training-mode BN. Returns (y, new_running_mean, new_running_var).

    Batch moments are biased (E[x^2] - E[x]^2 over N*spatial, matching
    bn_layer.cpp:93-158).  When ``axis_name`` is given and the call is inside
    ``shard_map``/``pmap`` over that mesh axis, moments are cross-shard
    averaged (SyncBN semantics, sync_bn_layer.cu:132-218) -- with per-shard
    equal counts this pmean equals the reference's global-moment allreduce.
    """
    xf = x.astype(jnp.float32)
    reduce_axes = tuple(i for i in range(x.ndim - 1))
    mean = jnp.mean(xf, axis=reduce_axes)
    mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
    if axis_name is not None:
        mean = lax.pmean(mean, axis_name)
        mean_sq = lax.pmean(mean_sq, axis_name)
    var = mean_sq - jnp.square(mean)
    y = bn_inference(x, gamma, beta, mean, var, eps=eps)
    new_mean = (1.0 - momentum) * mean + momentum * running_mean.astype(jnp.float32)
    new_var = (1.0 - momentum) * var + momentum * running_var.astype(jnp.float32)
    return y, new_mean.astype(running_mean.dtype), new_var.astype(running_var.dtype)


def fold_scale_shift(gamma, beta, mean, var, *, eps: float = DEFAULT_EPS):
    """BN -> (scale, shift) pair for weight folding.

    Same absorption math as the reference's ``gen_bn_inference.py:23-80``:
    a conv followed by this BN becomes ``w' = w * scale[out]``,
    ``b' = b * scale + shift``.
    """
    scale = gamma.astype(jnp.float32) * lax.rsqrt(var.astype(jnp.float32) + eps)
    shift = beta.astype(jnp.float32) - mean.astype(jnp.float32) * scale
    return scale, shift


def scale_shift(x, scale, shift):
    """Per-channel affine (the reference's Scale+Shift replacement path)."""
    return (x.astype(jnp.float32) * scale + shift).astype(x.dtype)
