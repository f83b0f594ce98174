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


def extract_windows(x: jax.Array, kernel, stride, outs, dilation=None):
    """Core window gather shared by :func:`im2col` and
    ``ops.pool.extract_pool_windows``: K strided slices over the
    (already padded) input, stacked to ``(N, *out, C, K)`` with kernel
    offsets ordered row-major (the Caffe im2col order).  Callers own the
    padding policy and output-dim arithmetic, which is where the two
    differ (symmetric conv padding + dilation vs ceil-mode high-pad).
    """
    import itertools

    if dilation is None:
        dilation = (1,) * len(kernel)
    slices = []
    for offs in itertools.product(*[range(k) for k in kernel]):
        idx = (slice(None),) + tuple(
            slice(o * d, o * d + (out - 1) * s + 1, s)
            for o, d, out, s in zip(offs, dilation, outs, stride)
        ) + (slice(None),)
        slices.append(x[idx])
    return jnp.stack(slices, axis=-1)


def im2col(x: jax.Array, kernel, stride=1, pad=0, dilation=1) -> jax.Array:
    """Explicit column view (im2col_layer.cpp / util/im2col.cpp:91-269).

    Logical Caffe output is (N, C*K, *out) with column index c*K + k_idx,
    k_idx row-major over kernel offsets; in our channels-last physical
    layout that is exactly (N, *out, C*K) -- one pad + K strided slices,
    no gather.  On TPU this layer is only a compatibility surface (XLA's
    conv does its own implicit im2col on the MXU).
    """
    from eco_tpu.utils.shapes import normalize_spatial_param

    num_spatial = x.ndim - 2
    kernel = normalize_spatial_param(kernel, num_spatial)
    stride = normalize_spatial_param(stride, num_spatial, default=1)
    pad = normalize_spatial_param(pad, num_spatial, default=0)
    dilation = normalize_spatial_param(dilation, num_spatial, default=1)
    if any(pad):
        x = jnp.pad(x, [(0, 0)] + [(p, p) for p in pad] + [(0, 0)])
    spatial = x.shape[1:-1]
    outs = [
        (size - d * (k - 1) - 1) // s + 1
        for size, k, s, d in zip(spatial, kernel, stride, dilation)
    ]
    cols = extract_windows(x, kernel, stride, outs, dilation)  # (N,*out,C,K)
    return cols.reshape(cols.shape[:-2] + (-1,))


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
