"""Maxpool 3x3/s2 third swing: strided-slice max vs reduce_window (round 5).

The two Pallas pool kernels (rounds 3-4) lost to XLA's reduce_window on
VPU lane-reshape limits, but reduce_window itself still runs at ~2.2x the
HBM 1R+1W floor (docs/PERF_NOTES.md stem table).  This probes a third
formulation that never leaves XLA: the 3x3/s2 max as an elementwise max
of 9 strided slices of the padded input,

    out = max_{di,dj in 0..2} x_pad[:, di::2, dj::2, :][:h_out, :w_out]

which XLA can fuse into one output-shaped loop reading 9 gathers -- total
read traffic 2.25x the input (the inherent window overlap) with no
reduce_window windowing machinery.  If the fusion materializes, the
expected time is ~(2.25R + 1W)/(1R + 1W) = 1.6x floor vs the measured
2.2x.

Shapes: ECO-Lite pool1 (F,112,112,64) and pool2 (F,56,56,192), bf16,
Caffe ceil-mode geometry (pad so out = ceil((in - 3)/2) + 1 = in/2).

Run on the real chip:  python examples/pool_slices_study.py [frames]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from eco_tpu.runtime.profiler import _device_loop_ms


def pool_rw(x):
    """reduce_window maxpool 3x3/s2, ceil-mode pad (0 lo, 1 hi)."""
    return lax.reduce_window(
        x, -jnp.inf if x.dtype != jnp.bfloat16 else jnp.array(
            -np.inf, jnp.bfloat16),
        lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (0, 1), (0, 1), (0, 0)))


def pool_slices(x):
    """Same pool as an elementwise max of 9 strided slices."""
    f, h, w, c = x.shape
    ho, wo = h // 2, w // 2
    neg = jnp.array(-np.inf, x.dtype)
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), constant_values=neg)
    out = None
    for di in range(3):
        for dj in range(3):
            s = lax.slice(xp, (0, di, dj, 0),
                          (f, di + 2 * (ho - 1) + 1, dj + 2 * (wo - 1) + 1, c),
                          (1, 2, 2, 1))
            out = s if out is None else jnp.maximum(out, s)
    return out


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 1536
    rng = np.random.default_rng(0)
    for h, w, c, name in ((112, 112, 64, "pool1"), (56, 56, 192, "pool2")):
        xh = rng.standard_normal((frames, h, w, c), np.float32)
        xs = jnp.asarray(xh[:4])
        ref = pool_rw(xs)
        got = pool_slices(xs)
        assert ref.shape == got.shape, (ref.shape, got.shape)
        assert float(jnp.max(jnp.abs(ref - got))) == 0.0

        x = jnp.asarray(xh, jnp.bfloat16)
        mb = x.size * 2 / 1e6
        floor_ms = (mb + mb / 4) / 819e3 * 1e3  # 1R + 1W @ 819 GB/s v5e
        a = _device_loop_ms(pool_rw, (x,), 30, 3)
        b = _device_loop_ms(pool_slices, (x,), 30, 3)
        print(f"{name} ({frames}x{h}x{w}x{c}, {mb:.0f} MB): "
              f"reduce_window {a:.3f} ms ({a / floor_ms:.2f}x floor)  "
              f"slices {b:.3f} ms ({b / floor_ms:.2f}x floor)  "
              f"win {a / b:.2f}x")


if __name__ == "__main__":
    main()
