"""Segment-axis layout transforms -- the TPU-native r2Dto3D.

The reference folds the segment axis S into the batch for the shared 2D
trunk, then rebuilds a true temporal axis for the 3D head with a Reshape +
Permute pair in NCHW (``r2Dto3D`` + ``Transpose1``,
ECO_Lite.prototxt:1310-1326).  In channels-last layout that whole dance is a
single free ``reshape``: (N*S, H, W, C) -> (N, S, H, W, C) *is already*
NDHWC with S as the depth axis.  No data movement, no transpose, nothing for
XLA to schedule.

Also provides the generic logical-NCHW <-> physical-channels-last bridges
used by the prototxt-compat executor for arbitrary Reshape/Permute layers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fold_segments(x: jax.Array) -> jax.Array:
    """(N, S, *spatial, C) -> (N*S, *spatial, C): run segments through a 2D net."""
    return x.reshape((-1,) + x.shape[2:])


def unfold_segments(x: jax.Array, num_segments: int) -> jax.Array:
    """(N*S, H, W, C) -> (N, S, H, W, C): the TPU-native r2Dto3D.

    The result is directly the NDHWC input of the 3D head (depth = segments),
    replacing the reference's Reshape+Permute([0,2,1,3,4]) pair.
    """
    return x.reshape((-1, num_segments) + x.shape[1:])


def segment_consensus(x: jax.Array, num_segments: int) -> jax.Array:
    """Mean over segments: (N*S, D) -> (N, D).

    Replaces ECO-Full's reshape->(N,1,16,1024) + AVE pool k=(16,1) + reshape
    (ECO_full.prototxt:4802-4810) with one mean.
    """
    return jnp.mean(
        x.reshape((-1, num_segments) + x.shape[1:]), axis=1, dtype=jnp.float32
    ).astype(x.dtype)


def to_logical(x: jax.Array) -> jax.Array:
    """channels-last physical -> Caffe NCHW-style logical (ndim >= 3)."""
    if x.ndim < 3:
        return x
    return jnp.moveaxis(x, -1, 1)


def to_physical(x: jax.Array) -> jax.Array:
    """Caffe NCHW-style logical -> channels-last physical (ndim >= 3)."""
    if x.ndim < 3:
        return x
    return jnp.moveaxis(x, 1, -1)


def caffe_reshape_dims(in_shape, dims, axis: int = 0, num_axes: int = -1):
    """Resolve a Caffe ReshapeParameter shape (0 = copy, -1 = infer).

    Mirrors reshape_layer.cpp / caffe.proto:909-971 on *logical* shapes.
    """
    in_shape = tuple(int(d) for d in in_shape)
    if axis != 0 or num_axes != -1:
        end = len(in_shape) if num_axes == -1 else axis + num_axes
        head, mid, tail = in_shape[:axis], in_shape[axis:end], in_shape[end:]
        return head + caffe_reshape_dims(mid, dims) + tail
    out = []
    infer = None
    for i, d in enumerate(dims):
        if d == 0:
            out.append(in_shape[i])
        elif d == -1:
            if infer is not None:
                raise ValueError("at most one -1 dim")
            infer = i
            out.append(-1)
        else:
            out.append(int(d))
    total = 1
    for d in in_shape:
        total *= d
    if infer is not None:
        known = 1
        for d in out:
            if d != -1:
                known *= d
        out[infer] = total // known
    return tuple(out)
