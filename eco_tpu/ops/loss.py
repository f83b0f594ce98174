"""Losses and in-graph metrics.

Reference parity:
- SoftmaxWithLoss (``softmax_loss_layer.{cpp,cu}``): fused log-softmax + NLL
  with ``ignore_label`` and normalization modes FULL / VALID / BATCH_SIZE /
  NONE (caffe.proto LossParameter; default normalize=true == VALID);
- Accuracy (``accuracy_layer.cpp``): top-k accuracy with ``ignore_label``.

All reductions run in f32 regardless of activation dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def softmax_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    *,
    ignore_label: Optional[int] = None,
    normalization: str = "valid",
) -> jax.Array:
    """logits: (N, C); labels: (N,) int. Returns scalar loss."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    nll = logz - picked
    if ignore_label is not None:
        valid = labels != ignore_label
        nll = jnp.where(valid, nll, 0.0)
        count = jnp.sum(valid.astype(jnp.float32))
    else:
        valid = None
        count = jnp.asarray(logits.shape[0], jnp.float32)
    total = jnp.sum(nll)
    normalization = normalization.lower()
    if normalization == "valid":
        return total / jnp.maximum(count, 1.0)
    if normalization in ("batch_size",):
        return total / logits.shape[0]
    if normalization == "full":
        return total / logits.shape[0]
    if normalization == "none":
        return total
    raise ValueError(f"unknown normalization {normalization!r}")


def softmax(logits: jax.Array) -> jax.Array:
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(logits.dtype)


def topk_accuracy(
    logits: jax.Array,
    labels: jax.Array,
    k: int = 1,
    *,
    ignore_label: Optional[int] = None,
) -> jax.Array:
    """Fraction of rows whose true label is within the top-k logits."""
    labels = labels.astype(jnp.int32)
    # Rank of the true class = number of classes with a strictly larger logit.
    true_logit = jnp.take_along_axis(
        logits.astype(jnp.float32), labels[:, None], axis=-1
    )
    rank = jnp.sum(logits.astype(jnp.float32) > true_logit, axis=-1)
    correct = (rank < k).astype(jnp.float32)
    if ignore_label is not None:
        valid = (labels != ignore_label).astype(jnp.float32)
        return jnp.sum(correct * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.mean(correct)


def hinge_loss(logits: jax.Array, labels: jax.Array, *, norm: str = "l1") -> jax.Array:
    """One-vs-all hinge loss (hinge_loss_layer.cpp): the true-class logit is
    negated, then ``max(0, 1 + m)`` per element; L1 sums the margins, L2 sums
    their squares; both divide by batch size."""
    x = logits.astype(jnp.float32)
    n, c = x.shape
    onehot = jax.nn.one_hot(labels.astype(jnp.int32), c, dtype=jnp.float32)
    signed = x * (1.0 - 2.0 * onehot)  # negate the true-class column
    m = jnp.maximum(0.0, 1.0 + signed)
    if norm.lower() == "l2":
        return jnp.sum(jnp.square(m)) / n
    return jnp.sum(m) / n


def sigmoid_cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Fused sigmoid + BCE (sigmoid_cross_entropy_loss_layer.cpp), stable
    form ``max(x,0) - x*t + log(1+exp(-|x|))``, normalized by BATCH size
    (outer num), not element count -- the reference divides by bottom[0]->num()."""
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    elem = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.sum(elem) / x.shape[0]


def infogain_loss(probs: jax.Array, labels: jax.Array, H: jax.Array) -> jax.Array:
    """Infogain loss (infogain_loss_layer.cpp): bottom[0] is a probability
    distribution (e.g. Softmax output); loss = -1/N sum_i sum_j
    H[label_i, j] * log(max(p_ij, 1e-20))."""
    p = probs.astype(jnp.float32)
    rows = H.astype(jnp.float32)[labels.astype(jnp.int32)]  # (N, C)
    logp = jnp.log(jnp.maximum(p, 1e-20))
    return -jnp.sum(rows * logp) / p.shape[0]


def contrastive_loss(a: jax.Array, b: jax.Array, similar: jax.Array,
                     *, margin: float = 1.0, legacy: bool = False) -> jax.Array:
    """Siamese contrastive loss (contrastive_loss_layer.cpp):
    d2_i = ||a_i - b_i||^2;
    loss = 1/(2N) * sum( y*d2 + (1-y)*max(margin - sqrt(d2), 0)^2 )
    (legacy_version uses max(margin - d2, 0) without the square)."""
    af = a.astype(jnp.float32).reshape(a.shape[0], -1)
    bf = b.astype(jnp.float32).reshape(a.shape[0], -1)
    y = similar.astype(jnp.float32).reshape(-1)
    d2 = jnp.sum(jnp.square(af - bf), axis=-1)
    if legacy:
        dissim = jnp.maximum(margin - d2, 0.0)
    else:
        dissim = jnp.square(jnp.maximum(margin - jnp.sqrt(jnp.maximum(d2, 1e-12)), 0.0))
    return jnp.sum(y * d2 + (1.0 - y) * dissim) / (2.0 * a.shape[0])
