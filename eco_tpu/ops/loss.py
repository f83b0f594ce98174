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
