"""InnerProduct (fully-connected) layer.

Reference ``inner_product_layer.{cpp,cu}`` stores weights as (out, in) and
computes ``y = x W^T + b``.  We store the TPU-friendly (in, out) layout so
the matmul feeds the MXU without a transpose; the caffemodel converter
transposes on import (see eco_tpu.convert.load).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inner_product(x: jax.Array, w: jax.Array, b: jax.Array | None = None):
    """x: (N, D_in); w: (D_in, D_out); b: (D_out,)."""
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    y = y.astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y
