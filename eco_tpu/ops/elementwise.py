"""Elementwise / structural ops: ReLU, dropout, eltwise, concat.

Reference parity:
- ReLU with optional ``negative_slope`` (relu_layer.cpp);
- inverted dropout -- Caffe scales kept units by 1/(1-ratio) at TRAIN and is
  identity at TEST (dropout_layer.cpp);
- Eltwise PROD/SUM/MAX plus the fork's STOCHASTIC_SUM, which at TRAIN
  includes each bottom independently with probability coeff[i] and at TEST
  is the coeff-weighted sum (eltwise_layer.cpp:101-118); ECO's residual adds
  are coefficient-less SUM;
- Concat along the channel axis (logical axis 1 -> physical last axis here).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def relu(x, negative_slope: float = 0.0):
    if negative_slope:
        return jnp.where(x >= 0, x, negative_slope * x)
    return jnp.maximum(x, 0)


def dropout(x, rate: float, *, train: bool, rng: jax.Array | None = None):
    if not train or rate <= 0.0:
        return x
    if rng is None:
        raise ValueError("dropout(train=True) needs an rng key")
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)


def eltwise(
    inputs: Sequence[jax.Array],
    op: str = "sum",
    coeffs: Sequence[float] | None = None,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
):
    op = op.lower()
    if op == "prod":
        out = inputs[0]
        for t in inputs[1:]:
            out = out * t
        return out
    if op == "max":
        out = inputs[0]
        for t in inputs[1:]:
            out = jnp.maximum(out, t)
        return out
    if op == "sum":
        if coeffs is None:
            coeffs = (1.0,) * len(inputs)
        out = None
        for c, t in zip(coeffs, inputs):
            term = t if c == 1.0 else c * t
            out = term if out is None else out + term
        return out
    if op == "stochastic_sum":
        # Reference eltwise_layer.cpp:101-116: TRAIN includes each bottom
        # independently with probability coeff[i] (coeff default 1.0);
        # TEST is the coeff-weighted sum.
        n = len(inputs)
        if coeffs is None:
            coeffs = (1.0,) * n
        if train:
            if rng is None:
                raise ValueError("stochastic_sum(train=True) needs an rng key")
            u = jax.random.uniform(rng, (n,))
            gates = (u <= jnp.asarray(coeffs)).astype(inputs[0].dtype)
            out = None
            for i, t in enumerate(inputs):
                term = gates[i] * t
                out = term if out is None else out + term
            return out
        out = None
        for c, t in zip(coeffs, inputs):
            term = t if c == 1.0 else c * t
            out = term if out is None else out + term
        return out
    raise ValueError(f"unknown eltwise op {op!r}")


def concat_channels(inputs: Sequence[jax.Array]):
    """Caffe Concat(axis=1) == channels-last concat on the final axis."""
    return jnp.concatenate(list(inputs), axis=-1)


def threshold(x, t: float = 0.0):
    """Step function (threshold_layer.cpp): y = 1 if x > t else 0.
    Not differentiable; Caffe declares no Backward for it either."""
    return (x > t).astype(x.dtype)


def bnll(x):
    """Binomial normal log-likelihood (bnll_layer.cpp):
    y = log(1 + exp(x)), computed in the overflow-stable split form
    x > 0 ? x + log(1+exp(-x)) : log(1+exp(x)) == softplus."""
    return jax.nn.softplus(x.astype(jnp.float32)).astype(x.dtype)


def mvn(x, *, across_channels: bool = False, normalize_variance: bool = True,
        eps: float = 1e-9):
    """Mean-variance normalization (mvn_layer.cpp) on channels-last input.

    Per sample: subtract the mean and (optionally) divide by ``sqrt(var)+eps``
    (eps OUTSIDE the sqrt, matching the reference exactly), where the
    reduction runs over H*W per channel, or over C*H*W when
    ``across_channels``; var = E[x^2] - E[x]^2 as in the reference.
    """
    xf = x.astype(jnp.float32)
    spatial = tuple(range(1, x.ndim - 1))
    axes = spatial + ((x.ndim - 1,) if across_channels else ())
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    y = xf - mean
    if normalize_variance:
        var = jnp.mean(jnp.square(xf), axis=axes, keepdims=True) - jnp.square(mean)
        y = y / (jnp.sqrt(var) + eps)
    return y.astype(x.dtype)


def lrn(x, *, local_size: int = 5, alpha: float = 1.0, beta: float = 0.75,
        k: float = 1.0):
    """Local response normalization ACROSS_CHANNELS (lrn_layer.cpp):
    y = x / (k + alpha/n * sum_{local window} x^2)^beta, channels-last."""
    sq = jnp.square(x.astype(jnp.float32))
    half = local_size // 2
    # sum over a sliding channel window via padding + cumulative trick
    padded = jnp.pad(sq, [(0, 0)] * (x.ndim - 1) + [(half, half)])
    csum = jnp.cumsum(padded, axis=-1)
    zeros = jnp.zeros_like(csum[..., :1])
    csum = jnp.concatenate([zeros, csum], axis=-1)
    window = csum[..., local_size:] - csum[..., :-local_size]
    scale = jnp.power(k + (alpha / local_size) * window, beta)
    return (x.astype(jnp.float32) / scale).astype(x.dtype)
