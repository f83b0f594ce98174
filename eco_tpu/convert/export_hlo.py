"""AOT serving artifacts via ``jax.export`` (StableHLO).

The reference's deployment story is a deploy prototxt + ``.caffemodel``
pair interpreted by the Caffe runtime at the destination
(``tools/caffe.cpp`` builds the Net, ``Net::Forward`` runs it).  The
TPU-native analogue is ahead-of-time lowering: the full inference
program -- optionally including the on-device uint8 preprocessing -- is
traced once, lowered to StableHLO with the trained weights baked in as
constants, and serialized into ONE self-contained artifact.  Any JAX
process can ``jax.export.deserialize`` and call it with **no eco_tpu, no
model code, no prototxt** at the destination; XLA re-optimizes the
embedded StableHLO for whatever chip generation it lands on (the
artifact is lowered for every platform in ``platforms``, tpu+cpu by
default).

Two artifact shapes:

* clips mode (default): ``(B, S, crop, crop, 3)`` model-ready clips in,
  class probabilities out -- the deploy-prototxt equivalent.
* ``uint8=True``: raw resized frames ``(B, S, H, W, 3) uint8`` + per-video
  ``(h_off, w_off, mirror)`` in -- the full UInt8Server serving path
  (apps/serving.py) in one artifact, so the destination host ships 4x
  less bytes and does zero per-frame math.  The preprocess is lowered as
  plain XLA ops (dynamic_slice + subtract), NOT the Pallas kernel: an
  exported artifact must avoid platform-pinned custom calls to stay
  loadable on future TPU generations and on CPU (jax.export's custom-call
  compatibility rules), and the op is ~0.1% of a step either way
  (docs/PERF_NOTES.md preprocess study).

``dynamic_batch=True`` exports with a symbolic batch dimension, so one
artifact serves any batch size (shape-polymorphic StableHLO).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jexport


def _crop_normalize_xla(frames_u8, h_off, w_off, mirror, *, crop, mean,
                        out_dtype, act_scale=None):
    """Portable (pure-XLA) twin of ops.pallas.preprocess.preprocess_on_device:
    uint8 (N, S, H, W, 3) + per-video crop offsets/mirror -> model clips.
    ``act_scale`` emits int8 clips quantized at that scale (the int8 input
    plane of quantized artifacts, convert.quantize.int8_input_rewrite)."""
    n, s, h, w, c = frames_u8.shape

    def one_video(frames, ho, wo):  # (S, H, W, 3)
        win = jax.lax.dynamic_slice(
            frames, (0, ho, wo, 0), (frames.shape[0], crop, crop, c)
        )
        return win.astype(jnp.float32) - jnp.asarray(mean, jnp.float32)

    clips = jax.vmap(one_video)(frames_u8, h_off, w_off)
    if act_scale is not None:
        clips = jnp.clip(jnp.round(clips / act_scale), -127, 127)
        out_dtype = jnp.int8
    flipped = clips[:, :, :, ::-1, :]
    return jnp.where(
        mirror[:, None, None, None, None], flipped, clips
    ).astype(out_dtype)


def export_serving(
    program,
    params,
    state,
    *,
    batch: int = 8,
    segments: int = 16,
    crop: int = 224,
    output: Optional[str] = None,
    platforms: Sequence[str] = ("tpu", "cpu"),
    dynamic_batch: bool = False,
    uint8: bool = False,
    frame_hw: tuple = (256, 340),
    mean=(104.0, 117.0, 123.0),
    mesh=None,
    data_axis: str = "data",
):
    """Lower ``program`` (a deploy-phase Program) to a serving artifact.

    Returns a ``jax.export.Exported``; persist with
    :func:`save_serving_artifact` and run anywhere with
    :func:`load_serving_artifact` (or raw ``jax.export.deserialize``).

    Weights/state are closed over and embedded as StableHLO constants --
    the artifact is the ``.caffemodel`` + deploy prototxt in one file.

    ``mesh``: a ``jax.sharding.Mesh`` makes the artifact MULTI-CHIP --
    inputs are batch-sharded over ``data_axis`` and GSPMD partitions the
    whole program (weights replicated, activations sharded); the
    destination calls it on any same-sized mesh of its own devices.
    Mutually exclusive with ``dynamic_batch`` (a symbolic dim cannot
    carry a divisibility-by-mesh constraint through serialization) and
    with a non-default ``platforms`` list: sharded exports lower for the
    mesh devices' own platform only (jax.export rejects
    platforms= for sharded programs), so a mesh artifact is
    single-platform by construction.
    """
    out_name = output or (
        "probs" if "probs" in program.output_names else program.output_names[-1]
    )
    dtype = program.compute_dtype or jnp.float32
    # device arrays serialize as their committed sharding; export wants
    # plain (replicated/host) constants
    params = jax.tree.map(np.asarray, params)
    state = jax.tree.map(np.asarray, state)

    if dynamic_batch:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = batch

    if uint8:
        fh, fw = frame_hw
        if fh < crop or fw < crop:
            raise ValueError(
                f"frame_hw {frame_hw} smaller than crop {crop}: the baked "
                "preprocess crops a fixed window from each frame"
            )
        # quantized graph: bake the int8 input plane into the artifact's
        # preprocess (no-op on float graphs)
        from eco_tpu.convert.quantize import int8_input_rewrite

        g2, in_scale = int8_input_rewrite(program.graph)
        if in_scale is not None:
            from eco_tpu.runtime.executor import Program

            program = Program(
                g2, train=False, compute_dtype=program.compute_dtype
            )

        def fn(frames_u8, h_off, w_off, mirror):
            clips = _crop_normalize_xla(
                frames_u8, h_off, w_off, mirror,
                crop=crop, mean=mean, out_dtype=dtype, act_scale=in_scale,
            )
            outs, _ = program.apply(params, state, {"data": clips})
            return outs[out_name]

        arg_specs = (
            jax.ShapeDtypeStruct((b, segments, fh, fw, 3), jnp.uint8),
            jax.ShapeDtypeStruct((b,), jnp.int32),
            jax.ShapeDtypeStruct((b,), jnp.int32),
            jax.ShapeDtypeStruct((b,), jnp.bool_),
        )
    else:

        def fn(clips):
            outs, _ = program.apply(params, state, {"data": clips})
            return outs[out_name]

        arg_specs = (
            jax.ShapeDtypeStruct((b, segments, crop, crop, 3), dtype),
        )

    if mesh is not None:
        if dynamic_batch:
            raise ValueError("mesh and dynamic_batch are mutually exclusive")
        if tuple(platforms) != ("tpu", "cpu"):
            # a silently dropped explicit platforms= would surprise the
            # caller into shipping a single-platform artifact believing
            # it is portable
            raise ValueError(
                "platforms= is unsupported with mesh=: sharded exports "
                "lower for the mesh devices' platform only"
            )
        if batch % mesh.shape[data_axis]:
            raise ValueError(
                f"batch {batch} not divisible by mesh axis "
                f"{data_axis!r}={mesh.shape[data_axis]}"
            )
        from jax.sharding import NamedSharding, PartitionSpec

        batch_sharded = NamedSharding(mesh, PartitionSpec(data_axis))
        jitted = jax.jit(fn, in_shardings=(batch_sharded,) * len(arg_specs))
        # sharded exports lower for the mesh's own platform only
        return jexport.export(jitted)(*arg_specs)
    return jexport.export(jax.jit(fn), platforms=list(platforms))(*arg_specs)


def save_serving_artifact(exported, path: str) -> int:
    """Serialize an Exported to ``path``; returns the byte size."""
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_serving_artifact(path: str):
    """Deserialize a serving artifact into a callable.

    The returned object is a plain function (wrapping
    ``Exported.call``) -- jit-compatible, differentiable-opaque, and
    runnable on any platform the artifact was lowered for.
    """
    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())

    def call(*args):
        return exported.call(*args)

    call.exported = exported
    return call
