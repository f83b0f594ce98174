"""Device-side fused preprocessing -- the north-star Pallas kernel.

The reference preprocesses on CPU threads (DataTransformer) and ships f32
NCHW tensors to the device.  Here the host ships raw **uint8** frames (4x
less host->device bandwidth) and a Pallas kernel fuses dynamic crop +
mean-subtract + bf16 cast on-chip, reading each frame once from HBM.

TPU mechanics: tiled (8, 128) memrefs only allow aligned dynamic DMA
offsets, so the kernel DMAs the aligned superset window and removes the
sub-tile residual with dynamic `pltpu.roll` rotations in VMEM (lane and
sublane rotates are native Mosaic ops), then writes the exact crop.

Mirroring is applied by the wrapper as a per-video lane flip outside the
kernel (XLA fuses the select into the consumer).

``preprocess_on_device`` is the public entry: uint8 (N, S, H, W, 3) +
per-video (h_off, w_off, mirror) -> bf16 (N, S, crop, crop, 3), matching
eco_tpu.data.transform semantics for the fixed-crop path (multi-scale
resize crops stay on the host/C++ plane).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB = 8     # sublane tile for the row axis
_LANE = 128  # lane tile (bytes) for the W*3 axis


@functools.partial(
    jax.jit, static_argnames=("crop", "out_dtype", "interpret", "act_scale")
)
def crop_normalize(
    frames: jax.Array,  # (T, H, W*3) uint8, H % 8 == 0 not required
    offsets: jax.Array,  # (T, 2) int32: (h_off, w_off_bytes = w_off*3)
    mean_row: jax.Array,  # (crop*3,) f32 tiled BGR mean
    *,
    crop: int,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    act_scale: float | None = None,
):
    t, h, w3 = frames.shape
    rows = crop + _SUB
    # lane rotates require lane-multiple vector widths
    cols = -(-(crop * 3 + _LANE) // _LANE) * _LANE
    # Pad so the aligned superset window always exists.
    frames = jnp.pad(frames, ((0, 0), (0, rows - crop), (0, cols - crop * 3)))
    mean2d = jnp.broadcast_to(mean_row, (crop, crop * 3))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            # frames stay in HBM; DMA offsets there must be tile-aligned.
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((crop, crop * 3), lambda i, off: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, crop, crop * 3), lambda i, off: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, cols), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
    )

    def kernel(off_ref, frames_ref, mean_ref, out_ref, buf, sem):
        i = pl.program_id(0)
        h0 = off_ref[i, 0]
        w0 = off_ref[i, 1]
        h0a = (h0 // _SUB) * _SUB
        w0a = (w0 // _LANE) * _LANE
        cp = pltpu.make_async_copy(
            frames_ref.at[i, pl.ds(h0a, rows), pl.ds(w0a, cols)], buf, sem
        )
        cp.start()
        cp.wait()
        # Mosaic has no direct uint8->f32 cast; widen through int32.
        window = buf[...].astype(jnp.int32).astype(jnp.float32)
        # dynamic_rotate mishandles negative shifts at some shapes; use the
        # positive complement (left-shift by d == right-shift by size - d).
        window = pltpu.roll(window, (rows - (h0 - h0a)) % rows, 0)
        window = pltpu.roll(window, (cols - (w0 - w0a)) % cols, 1)
        patch = window[0:crop, 0:crop * 3]
        y = patch - mean_ref[...]
        if act_scale is not None:
            # fused input quantization (int8 serving plane): identical math
            # to ops.quant.quantize_act, so the consuming q-layer's exact
            # dequant at act_scale holds.  f32 -> int8 widens through int32
            # (Mosaic has no direct narrow cast, mirroring the load path).
            y = jnp.clip(jnp.round(y / act_scale), -127, 127).astype(jnp.int32)
        out_ref[0] = y.astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t, crop, crop * 3), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(offsets, frames, mean2d)


def preprocess_on_device(
    frames_u8: jax.Array,  # (N, S, H, W, 3) uint8, BGR
    h_off: jax.Array,  # (N,) int32 per-video
    w_off: jax.Array,  # (N,) int32
    mirror: jax.Array,  # (N,) bool
    *,
    crop: int = 224,
    mean=(104.0, 117.0, 123.0),
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    act_scale: float | None = None,
):
    """uint8 frames + per-video augment decisions -> model-ready clips.

    ``act_scale`` set -> the kernel emits int8 clips quantized at that
    scale (``clip(round((x - mean)/s))``): the serving plane for graphs
    whose first conv is int8-quantized (convert.quantize.int8_input_rewrite)
    feeds conv1 directly, skipping both the bf16 HBM round trip and the
    standalone input-quantize pass.
    """
    n, s, h, w, c = frames_u8.shape
    assert c == 3
    if act_scale is not None:
        out_dtype = jnp.int8
    flat = frames_u8.reshape(n * s, h, w * 3)
    # per-frame offsets = per-video offsets replicated over segments
    offs = jnp.stack(
        [jnp.repeat(h_off, s), jnp.repeat(w_off, s) * 3], axis=1
    ).astype(jnp.int32)
    mean_row = jnp.tile(jnp.asarray(mean, jnp.float32), crop)
    out = crop_normalize(
        flat, offs, mean_row, crop=crop, out_dtype=out_dtype,
        interpret=interpret,
        act_scale=float(act_scale) if act_scale is not None else None,
    )
    out = out.reshape(n, s, crop, crop, 3)
    flipped = out[:, :, :, ::-1, :]
    return jnp.where(mirror[:, None, None, None, None], flipped, out)
