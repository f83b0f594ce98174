"""End-to-end TPU serving path: raw uint8 frames in, probabilities out.

Composes the Pallas on-device preprocessing kernel (crop/mirror/mean/bf16,
eco_tpu.ops.pallas.preprocess) with an inference-optimized Program
(sibling-1x1 merge + BN fold) into ONE jitted program.  The host ships
uint8 (4x less transfer than f32) and does no per-frame math at all --
the full "online video understanding" loop of the reference
(decode -> transform -> forward, README.md:22) runs on-chip past decode.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from eco_tpu.ops.pallas.preprocess import preprocess_on_device


class UInt8Server:
    """Batched video scorer over raw resized frames.

    frames: uint8 (N, S, H, W, 3) BGR (e.g. 256x340 decoder output);
    crops are center (serving) unless offsets are supplied.
    """

    def __init__(self, program, params, state, *, crop: int = 224,
                 mean=(104.0, 117.0, 123.0), output: Optional[str] = None,
                 interpret: bool = False):
        self.program = program
        self.params = params
        self.state = state
        self.crop = crop
        self.mean = mean
        self.output = output or (
            "probs" if "probs" in program.output_names else program.output_names[-1]
        )
        self._interpret = interpret

        @jax.jit
        def serve(params, state, frames_u8, h_off, w_off, mirror):
            clips = preprocess_on_device(
                frames_u8, h_off, w_off, mirror, crop=self.crop,
                mean=self.mean, interpret=self._interpret,
            )
            outs, _ = program.apply(params, state, {"data": clips})
            return outs[self.output]

        self._serve = serve

    def __call__(self, frames_u8, *, h_off=None, w_off=None, mirror=None):
        n, s, h, w, _ = frames_u8.shape
        if h_off is None:
            h_off = jnp.full((n,), (h - self.crop) // 2, jnp.int32)
        if w_off is None:
            w_off = jnp.full((n,), (w - self.crop) // 2, jnp.int32)
        if mirror is None:
            mirror = jnp.zeros((n,), bool)
        return self._serve(self.params, self.state, frames_u8, h_off, w_off, mirror)
