"""Stem-conv space-to-depth study (round 5).

The whole-model profile (docs/PERF_NOTES.md) pins conv1_7x7_s2 at ~25%
MFU: with C_in=3 the im2col contraction K = 7*7*3 = 147 wastes MXU rows,
and PERF_NOTES names "layout-level changes" as the only remaining
inference headroom.  This study measures the classic space-to-depth
rewrite of the stem (used by MLPerf ResNet TPU submissions):

    conv 7x7 stride-2 pad-3 on (F, 224, 224, 3)
 == conv 4x4 stride-1 VALID on (F, 115, 115, 12)

where the input is padded by 3 and 2x2-blocked into channels
(K = 4*4*12 = 192, a full MXU row tile) and the 7x7 kernel is
zero-padded to 8x8 then blocked the same way.  Derivation: with
x_pad[i] = x[i-3], o[i] = sum_k x_pad[2i+k] w[k]; writing k = 2m+r gives
o[i] = sum_{m,r} y[i+m, r] w[2m+r] with y[j, r] = x_pad[2j+r] -- a 4-tap
stride-1 conv over the blocked tensor (per spatial axis).

Three timings (K-vs-1 device loop, per-endpoint minima -- the hardened
round-5 estimator from eco_tpu/runtime/profiler.py):
  A. baseline conv1 as the folded graph runs it today;
  B. s2d with the input transform IN-GRAPH (pad+reshape+transpose paid
     on-chip each call -- what a graph rewrite alone would buy);
  C. s2d with a PRE-BLOCKED input (what fusing the blocking into the
     Pallas preprocess / host feed would buy).

Run on the real chip:  python examples/stem_s2d_study.py [frames]

Reference anchor: conv1/7x7_s2 in the BN-Inception trunk
(models_ECO_Lite/kinetics/ECO_Lite.prototxt conv1 layer; im2col shape
cost discussed at src/caffe/util/im2col.cpp:91-269).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from eco_tpu.runtime.profiler import _device_loop_ms


def s2d_input(x):
    """(F, H, W, 3) -> pad 3, 2x2 block -> (F, H/2+3, W/2+3, 12)."""
    f, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    hp, wp = h + 6, w + 6  # 230: even, so the blocking is exact
    x = x.reshape(f, hp // 2, 2, wp // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (F, 115, 115, rh, rw, c)
    return x.reshape(f, hp // 2, wp // 2, 4 * c)


def s2d_weight(w):
    """(7, 7, 3, 64) -> zero-pad to 8x8 -> (4, 4, 12, 64)."""
    kh, kw, ci, co = w.shape
    w = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    w = w.reshape(4, 2, 4, 2, ci, co)
    w = w.transpose(0, 2, 1, 3, 4, 5)  # (m, n, rh, rw, ci, co)
    return w.reshape(4, 4, 4 * ci, co)


def phase_inputs(x):
    """Row-parity split: pad 3 -> two (F, 115, 115, 6) phase tensors.

    Key observation: blocking only the ROW phase into separate tensors
    leaves the (column, channel) blocking FREE -- within one row of
    x_pad, bytes are already laid out as v*6 + rw*3 + c, so
    Q_rh[j, v, rw*3+c] = x_pad[2j+rh, 2v+rw, c] is a stride-2 row slice
    plus a pure reshape.  No transpose anywhere.
    """
    f, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    hp, wp = h + 6, w + 6
    return [
        xp[:, rh::2].reshape(f, hp // 2, wp // 2, 2 * c) for rh in (0, 1)
    ]


def phase_weights(w):
    """(7, 7, 3, 64) -> two (4, 4, 6, 64) row-phase kernels."""
    kh, kw, ci, co = w.shape
    w8 = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    w8 = w8.reshape(4, 2, 4, 2, ci, co)
    # w8[:, rh] axes are (m, n, rw, ci, co); (rw, ci) are already adjacent
    # in the needed order, so the K=6 flatten is a plain reshape.
    return [w8[:, rh].reshape(4, 4, 2 * ci, co) for rh in (0, 1)]


def conv_phase(qs, wps):
    out = conv_s2d(qs[0], wps[0])
    return out + conv_s2d(qs[1], wps[1])


def paired_input(x):
    """Pad 3 -> (F, 115, 2, 115, 6) by FREE reshapes only.

    (230, 230, 3) -> (115, 2, 115, 6) splits/merges contiguous axes
    (row pairs are adjacent in memory; (2v+rw, c) -> (v, rw*3+c) is a
    minor-dim regroup), so unlike s2d_input there is NO transpose --
    the only real work is the pad.
    """
    f, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    hp, wp = h + 6, w + 6
    return xp.reshape(f, hp // 2, 2, wp // 2, 2 * c)


def paired_weight(w):
    """(7, 7, 3, 64) -> (4, 2, 4, 6, 64): (m, rh, n, rw*3+c, o)."""
    kh, kw, ci, co = w.shape
    w8 = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    return w8.reshape(4, 2, 4, 2 * ci, co)


def conv_paired(y5, w5):
    """3D conv, window (4, 2, 4) over (j, rh, v), VALID: K = 192."""
    out = lax.conv_general_dilated(
        y5, w5, (1, 1, 1), "VALID",
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
    return out[:, :, 0]  # rh window spans the full extent-2 axis


def conv_base(x, w):
    return lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_s2d(y, wb):
    return lax.conv_general_dilated(
        y, wb, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 1536
    rng = np.random.default_rng(0)
    xh = rng.standard_normal((frames, 224, 224, 3), np.float32)
    wh = rng.standard_normal((7, 7, 3, 64), np.float32) * 0.05

    # numeric parity first, in f32 on a small slice
    xs = jnp.asarray(xh[:8])
    ws = jnp.asarray(wh)
    ref = conv_base(xs, ws)
    got = conv_s2d(s2d_input(xs), s2d_weight(ws))
    err = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
    print(f"parity: shapes {ref.shape} == {got.shape}, rel err {err:.2e}")
    assert ref.shape == got.shape and err < 1e-5
    gotp = conv_phase(phase_inputs(xs), phase_weights(ws))
    errp = float(jnp.max(jnp.abs(ref - gotp)) / jnp.max(jnp.abs(ref)))
    print(f"parity (row-phase): shapes {ref.shape} == {gotp.shape}, "
          f"rel err {errp:.2e}")
    assert ref.shape == gotp.shape and errp < 1e-5
    gotq = conv_paired(paired_input(xs), paired_weight(ws))
    errq = float(jnp.max(jnp.abs(ref - gotq)) / jnp.max(jnp.abs(ref)))
    print(f"parity (paired 3D): shapes {ref.shape} == {gotq.shape}, "
          f"rel err {errq:.2e}")
    assert ref.shape == gotq.shape and errq < 1e-5

    x = jnp.asarray(xh, jnp.bfloat16)
    w = jnp.asarray(wh, jnp.bfloat16)
    wb = jax.jit(s2d_weight)(w)
    y = jax.jit(s2d_input)(x)

    flops = 2 * frames * 112 * 112 * 64 * 7 * 7 * 3
    iters, reps = 30, 3
    a = _device_loop_ms(lambda x, w: conv_base(x, w), (x, w), iters, reps)
    b = _device_loop_ms(
        lambda x, w: conv_s2d(s2d_input(x), s2d_weight(w)), (x, w),
        iters, reps)
    c = _device_loop_ms(lambda y, wb: conv_s2d(y, wb), (y, wb), iters, reps)

    wps = [jax.jit(phase_weights)(w)[i] for i in (0, 1)]
    qs = [jax.jit(phase_inputs)(x)[i] for i in (0, 1)]
    d = _device_loop_ms(
        lambda x, w0, w1: conv_phase(phase_inputs(x), (w0, w1)),
        (x, wps[0], wps[1]), iters, reps)
    e = _device_loop_ms(
        lambda q0, q1, w0, w1: conv_phase((q0, q1), (w0, w1)),
        (qs[0], qs[1], wps[0], wps[1]), iters, reps)

    w5 = jax.jit(paired_weight)(w)
    y5 = jax.jit(paired_input)(x)
    f_ing = _device_loop_ms(
        lambda x, w5: conv_paired(paired_input(x), w5), (x, w5), iters, reps)
    g_pre = _device_loop_ms(
        lambda y5, w5: conv_paired(y5, w5), (y5, w5), iters, reps)

    def row(name, ms):
        print(f"{name:38s} {ms:7.3f} ms  {flops / ms / 1e9:6.1f} TF/s")

    row("A baseline 7x7 s2 (C=3, K=147)", a)
    row("B s2d, in-graph input transform", b)
    row("C s2d, pre-blocked input (K=192)", c)
    row("D row-phase split in-graph (2x K=96)", d)
    row("E row-phase pre-split (2x K=96)", e)
    row("F paired 3D conv, in-graph pad+reshape", f_ing)
    row("G paired 3D conv, pre-paired input", g_pre)
    print(f"B vs A: {a / b:.2f}x   C vs A: {a / c:.2f}x   "
          f"D vs A: {a / d:.2f}x   E vs A: {a / e:.2f}x   "
          f"F vs A: {a / f_ing:.2f}x   G vs A: {a / g_pre:.2f}x   "
          f"(s2d FLOPs overhead {192 / 147:.2f}x counted at A's FLOPs)")


if __name__ == "__main__":
    main()
