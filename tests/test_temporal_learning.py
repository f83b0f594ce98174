"""Temporal-fusion capability test: the 3D head must learn ORDER.

Classes are designed so no single frame (and no average over segments)
distinguishes them -- only the temporal direction does:

  class 0: brightness ramps UP across segments   (20 -> 120)
  class 1: brightness ramps DOWN across segments (120 -> 20)

Every class sees the same set of frame brightnesses, so a 2D consensus
model (mean over segments) is at chance by construction; only the
r2Dto3D + 3D-ResNet temporal convolutions can separate them.  This is the
capability the reference's whole architecture exists for (ECO paper's
motivating claim), and something its test suite never checks.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from eco_tpu.models import build_eco_lite
from eco_tpu.runtime import Program
from eco_tpu.train import SolverConfig, init_train_state, make_train_step

pytestmark = pytest.mark.slow  # compile-heavy: full-model builds


def _make_batch(rng, n, segments, crop):
    ramps = np.linspace(20, 120, segments, dtype=np.float32)
    data = np.zeros((n, segments, crop, crop, 3), np.float32)
    labels = rng.integers(0, 2, n).astype(np.int32)
    for i in range(n):
        seq = ramps if labels[i] == 0 else ramps[::-1]
        noise = rng.normal(0, 4, (segments, crop, crop, 3))
        data[i] = seq[:, None, None, None] + noise
    return {"data": data - 70.0, "label": labels}  # roughly centered


def test_3d_head_learns_temporal_order():
    rng = np.random.default_rng(0)
    S, crop = 4, 48
    g = build_eco_lite(num_classes=2, num_segments=S, crop_size=crop,
                       with_loss=True, batch=6)
    prog = Program(g, train=True)
    b0 = _make_batch(rng, 6, S, crop)
    params, state = prog.init(jax.random.PRNGKey(0), b0)
    cfg = SolverConfig(base_lr=0.01, lr_policy="fixed", iter_size=1,
                       clip_gradients=40.0, solver_type="nesterov")
    step = jax.jit(make_train_step(prog, cfg))
    ts = init_train_state(params, state)
    for i in range(18):
        b = _make_batch(rng, 6, S, crop)
        ts, m = step(
            ts, {"data": b["data"][None], "label": b["label"][None]},
            jax.random.PRNGKey(i),
        )
    # evaluate on fresh samples
    eval_prog = Program(g, train=False)
    correct = 0
    total = 0
    for i in range(4):
        b = _make_batch(rng, 6, S, crop)
        outs, _ = eval_prog.apply(ts.params, ts.state, b, capture=["fc8"])
        pred = np.asarray(outs["fc8"]).argmax(-1)
        correct += int((pred == b["label"]).sum())
        total += len(pred)
    acc = correct / total
    assert acc >= 0.85, f"temporal order not learned: acc={acc}"
