"""Solver-update semantics vs closed form (reference
test_gradient_based_solver.cpp methodology) + LR policies + checkpointing."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eco_tpu.spec.netspec import NetBuilder
from eco_tpu.runtime import Program
from eco_tpu.train import (
    SolverConfig,
    init_train_state,
    learning_rate,
    make_train_step,
    restore,
    restore_weights,
    save_model,
    snapshot,
)


def _tiny_graph(with_loss=True):
    b = NetBuilder("tiny")
    x = b.input("data", (4, 8))
    b.input("label", (4,))
    y = b.fc("fc", x, 3)
    b.layer("loss", "softmaxwithloss", (y, "label"))
    return b.build()


def _setup(cfg, seed=0):
    g = _tiny_graph()
    prog = Program(g, train=True)
    rng = np.random.default_rng(seed)
    batch = {
        "data": jnp.asarray(rng.standard_normal((cfg.iter_size, 4, 8)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 3, (cfg.iter_size, 4))),
    }
    params, state = prog.init(jax.random.PRNGKey(seed), jax.tree.map(lambda x: x[0], batch))
    ts = init_train_state(params, state)
    return prog, ts, batch


def _manual_grad(prog, params, state, batch, iter_size):
    """Accumulated raw grads over micro-batches (what Caffe's diffs hold)."""
    def loss(p, micro):
        outs, _ = prog.apply(p, state, micro)
        return outs["loss"]
    total = None
    for i in range(iter_size):
        micro = jax.tree.map(lambda x: x[i], batch)
        g = jax.grad(loss)(params, micro)
        total = g if total is None else jax.tree.map(jnp.add, total, g)
    return total


@pytest.mark.parametrize("solver_type", ["sgd", "nesterov", "adagrad"])
def test_update_matches_closed_form(solver_type):
    cfg = SolverConfig(
        base_lr=0.05, lr_policy="fixed", momentum=0.9, weight_decay=0.01,
        iter_size=2, clip_gradients=-1, solver_type=solver_type, delta=1e-8,
    )
    prog, ts, batch = _setup(cfg)
    step = make_train_step(prog, cfg)
    new_ts, metrics = jax.jit(step)(ts, batch, jax.random.PRNGKey(1))

    gsum = _manual_grad(prog, ts.params, ts.state, batch, 2)
    w = np.asarray(ts.params["fc"]["w"])
    g = np.asarray(gsum["fc"]["w"]) / 2.0  # Normalize by iter_size
    # fc weight has decay_mult 1.0 -> L2 regularize
    g = g + 0.01 * w
    h0 = np.zeros_like(w)
    lr = 0.05  # lr_mult 1.0 on fc weights
    if solver_type == "sgd":
        h1 = 0.9 * h0 + lr * g
        expect = w - h1
    elif solver_type == "nesterov":
        h1 = 0.9 * h0 + lr * g
        expect = w - ((1 + 0.9) * h1 - 0.9 * h0)
    else:
        h1 = h0 + g**2
        expect = w - lr * g / (np.sqrt(h1) + 1e-8)
    np.testing.assert_allclose(
        np.asarray(new_ts.params["fc"]["w"]), expect, rtol=1e-4, atol=1e-6
    )
    # bias: lr_mult 2, decay_mult 0
    b = np.asarray(ts.params["fc"]["b"])
    gb = np.asarray(gsum["fc"]["b"]) / 2.0
    if solver_type == "nesterov":
        hb = 0.9 * 0 + 2 * lr * gb
        expect_b = b - ((1 + 0.9) * hb)
        np.testing.assert_allclose(
            np.asarray(new_ts.params["fc"]["b"]), expect_b, rtol=1e-4, atol=1e-6
        )


def test_clip_applied_to_accumulated_grads():
    # Caffe clips the RAW accumulated diffs before Normalize (ApplyUpdate,
    # solver.cpp:661-674); verify threshold uses the un-normalized sum.
    cfg = SolverConfig(
        base_lr=1.0, lr_policy="fixed", momentum=0.0, weight_decay=0.0,
        iter_size=2, clip_gradients=0.5, solver_type="sgd",
    )
    prog, ts, batch = _setup(cfg)
    step = make_train_step(prog, cfg)
    new_ts, metrics = jax.jit(step)(ts, batch, jax.random.PRNGKey(1))
    gsum = _manual_grad(prog, ts.params, ts.state, batch, 2)
    flat = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(gsum)])
    gnorm = np.linalg.norm(flat)
    np.testing.assert_allclose(float(metrics["grad_norm"]), gnorm, rtol=1e-4)
    scale = 0.5 / gnorm if gnorm > 0.5 else 1.0
    g = np.asarray(gsum["fc"]["w"]) * scale / 2.0
    np.testing.assert_allclose(
        np.asarray(new_ts.params["fc"]["w"]),
        np.asarray(ts.params["fc"]["w"]) - g,
        rtol=1e-4, atol=1e-6,
    )


def test_lr_policies():
    mk = lambda **kw: SolverConfig(base_lr=0.1, **kw)
    assert float(learning_rate(mk(lr_policy="fixed"), 100)) == pytest.approx(0.1)
    assert float(
        learning_rate(mk(lr_policy="step", gamma=0.1, stepsize=24000), 24000)
    ) == pytest.approx(0.01)
    assert float(
        learning_rate(mk(lr_policy="step", gamma=0.1, stepsize=24000), 23999)
    ) == pytest.approx(0.1)
    assert float(
        learning_rate(mk(lr_policy="multistep", gamma=0.1, stepvalues=(10, 20)), 15)
    ) == pytest.approx(0.01)
    assert float(
        learning_rate(mk(lr_policy="poly", power=2.0, max_iter=100), 50)
    ) == pytest.approx(0.1 * 0.25)
    assert float(
        learning_rate(mk(lr_policy="exp10", stepsize=10), 10)
    ) == pytest.approx(0.01)
    assert float(
        learning_rate(mk(lr_policy="inv", gamma=0.1, power=0.5), 0)
    ) == pytest.approx(0.1)


def test_snapshot_restore_roundtrip(tmp_path):
    cfg = SolverConfig(base_lr=0.05, lr_policy="fixed", iter_size=1)
    prog, ts, batch = _setup(cfg)
    step = jax.jit(make_train_step(prog, cfg))
    for i in range(3):
        ts, _ = step(ts, batch, jax.random.PRNGKey(i))
    prefix = str(tmp_path / "snap")
    mpath, spath = snapshot(prefix, ts, int(ts.it))
    assert os.path.exists(mpath) and os.path.exists(spath)

    # restore into a fresh state
    prog2, ts2, _ = _setup(cfg, seed=99)
    restored = restore(spath, ts2)
    assert int(restored.it) == 3
    np.testing.assert_array_equal(
        np.asarray(restored.params["fc"]["w"]), np.asarray(ts.params["fc"]["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(restored.history["fc"]["w"]), np.asarray(ts.history["fc"]["w"])
    )
    # continuing training from the restored state works
    ts3, m = step(restored, batch, jax.random.PRNGKey(9))
    assert np.isfinite(float(m["loss"]))


def test_multi_checkpoint_name_based_transfer(tmp_path):
    # run.sh --weights=2d.caffemodel,3d.caffemodel equivalent
    cfg = SolverConfig()
    prog, ts, batch = _setup(cfg)
    p1 = str(tmp_path / "a.model.npz")
    save_model(p1, {"fc": {"w": np.full((8, 3), 7.0, np.float32)}}, {})
    p2 = str(tmp_path / "b.model.npz")
    save_model(p2, {"fc": {"b": np.full((3,), 5.0, np.float32)},
                    "other": {"w": np.zeros((2, 2), np.float32)}}, {})
    params, state, loaded = restore_weights(f"{p1},{p2}", ts.params, ts.state)
    np.testing.assert_array_equal(np.asarray(params["fc"]["w"]), 7.0)
    np.testing.assert_array_equal(np.asarray(params["fc"]["b"]), 5.0)
    assert loaded == ["fc"]  # "other" ignored: not in the model
    # shape mismatch raises
    p3 = str(tmp_path / "c.model.npz")
    save_model(p3, {"fc": {"w": np.zeros((4, 3), np.float32)}}, {})
    with pytest.raises(ValueError):
        restore_weights(p3, ts.params, ts.state)


def test_frozen_bn_gets_zero_lr():
    b = NetBuilder("frz")
    x = b.input("data", (2, 4, 4, 3))
    b.input("label", (2,))
    x = b.conv("c", x, 4, k=1)
    x = b.bn("c_bn", x, frozen=True)
    x = b.layer("flat", "flatten", x)
    y = b.fc("fc", x, 2)
    b.layer("loss", "softmaxwithloss", (y, "label"))
    g = b.build()
    prog = Program(g, train=True)
    batch = {
        "data": jnp.asarray(np.random.default_rng(0).standard_normal((1, 2, 4, 4, 3)), jnp.float32),
        "label": jnp.zeros((1, 2), jnp.int32),
    }
    params, state = prog.init(jax.random.PRNGKey(0), jax.tree.map(lambda x: x[0], batch))
    ts = init_train_state(params, state)
    cfg = SolverConfig(base_lr=0.5, lr_policy="fixed", weight_decay=0.0)
    new_ts, _ = jax.jit(make_train_step(prog, cfg))(ts, batch, jax.random.PRNGKey(1))
    # frozen BN params unchanged; frozen BN state unchanged (uses running stats)
    np.testing.assert_array_equal(
        np.asarray(new_ts.params["c_bn"]["gamma"]), np.asarray(ts.params["c_bn"]["gamma"])
    )
    np.testing.assert_array_equal(
        np.asarray(new_ts.state["c_bn"]["mean"]), np.asarray(ts.state["c_bn"]["mean"])
    )
    # conv weights DID move
    assert not np.allclose(
        np.asarray(new_ts.params["c"]["w"]), np.asarray(ts.params["c"]["w"])
    )
