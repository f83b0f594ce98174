"""Model graph tests: shapes, phases, train/eval behavior, ECO-Full fusion."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eco_tpu.models import build_eco_full, build_eco_lite, get_model
from eco_tpu.runtime import Program

pytestmark = pytest.mark.slow  # compile-heavy: full-model builds


def _run(graph, train, inputs, rng=0):
    prog = Program(graph, train=train)
    params, state = prog.init(jax.random.PRNGKey(rng), inputs)
    outs, new_state = prog.apply(
        params, state, inputs, rng=jax.random.PRNGKey(rng + 1)
    )
    return prog, params, state, outs, new_state


def test_eco_lite_deploy_shapes():
    g = build_eco_lite(num_classes=101, num_segments=4, fc_name="fc8u", batch=2)
    inputs = {"data": jnp.zeros((2, 4, 224, 224, 3), jnp.float32)}
    prog, params, state, outs, _ = _run(g, False, inputs)
    assert outs["probs"].shape == (2, 101)
    np.testing.assert_allclose(np.asarray(outs["probs"]).sum(-1), 1.0, atol=1e-4)
    # trunk + 3D head parameter inventory
    assert "conv1_7x7_s2" in params and "res5b_2" in params
    assert params["fc8u"]["w"].shape == (512, 101)
    # 3D convs are DHWIO
    assert params["res3a_2n"]["w"].shape == (3, 3, 3, 96, 128)
    assert params["res4a_down"]["w"].shape == (3, 3, 3, 128, 256)
    # BN state exists for trunk and head
    assert state["conv1_7x7_s2_bn"]["mean"].shape == (64,)
    assert state["res5b_bn"]["var"].shape == (512,)


def test_eco_lite_train_loss_and_bn_update():
    g = build_eco_lite(num_classes=51, num_segments=4, fc_name="fc8h",
                       with_loss=True, batch=2)
    inputs = {
        "data": jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 4, 224, 224, 3)),
            jnp.float32,
        ),
        "label": jnp.asarray([3, 7]),
    }
    prog, params, state, outs, new_state = _run(g, True, inputs)
    assert outs["loss"].shape == ()
    assert float(outs["loss"]) > 0
    # Training mode must move BN running stats (EMA update)
    before = np.asarray(state["res3a_bn"]["mean"])
    after = np.asarray(new_state["res3a_bn"]["mean"])
    assert not np.allclose(before, after)
    # Accuracy layers are TEST-phase only -> absent in train outputs
    assert "top1" not in outs


def test_eco_lite_test_phase_has_metrics():
    g = build_eco_lite(num_classes=51, num_segments=4, fc_name="fc8h",
                       with_loss=True, batch=2)
    inputs = {
        "data": jnp.zeros((2, 4, 224, 224, 3), jnp.float32),
        "label": jnp.asarray([3, 7]),
    }
    prog, params, state, outs, new_state = _run(g, False, inputs)
    assert set(outs) >= {"loss", "top1", "top5"}
    # eval must not touch state
    np.testing.assert_array_equal(
        np.asarray(state["res3a_bn"]["mean"]),
        np.asarray(new_state["res3a_bn"]["mean"]),
    )


def test_eco_full_fusion_shapes():
    g = build_eco_full(num_classes=400, num_segments=4, batch=1)
    inputs = {"data": jnp.zeros((1, 4, 224, 224, 3), jnp.float32)}
    prog, params, state, outs, _ = _run(g, False, inputs)
    assert outs["probs"].shape == (1, 400)
    # fused feature is [1024-d 2D consensus | 512-d 3D]
    assert params["fc8N"]["w"].shape == (1536, 400)
    # full 2D branch exists through 5b
    assert "inception_5b_pool_proj" in params
    # 3c double tower is shared (exists exactly once)
    assert "inception_3c_double_3x3_1" in params


def test_num_segments_retargeting():
    # README.md:85-95 8-segment recipe: only num_segments changes; the global
    # pool kernel adapts (S/4 temporal extent) automatically.
    for s in (8, 16):
        g = build_eco_lite(num_classes=400, num_segments=s, batch=1)
        inputs = {"data": jnp.zeros((1, s, 224, 224, 3), jnp.float32)}
        prog, params, state, outs, _ = _run(g, False, inputs)
        assert outs["probs"].shape == (1, 400)


def test_zoo_registry():
    assert len(get_model.__globals__["REGISTRY"]) == 10  # 8 ECO + 2 C3D
    g = get_model("eco_lite_ucf101", num_segments=4, batch=1)
    assert g.layer("fc8u").opt("num_output") == 101


def test_jit_and_grad_through_program():
    g = build_eco_lite(num_classes=10, num_segments=4, fc_name="fc8",
                       with_loss=True, batch=2)
    prog = Program(g, train=True)
    inputs = {
        "data": jnp.asarray(
            np.random.default_rng(1).standard_normal((2, 4, 224, 224, 3)),
            jnp.float32,
        ),
        "label": jnp.asarray([1, 2]),
    }
    params, state = prog.init(jax.random.PRNGKey(0), inputs)

    @jax.jit
    def loss_fn(params, state, inputs, rng):
        outs, new_state = prog.apply(params, state, inputs, rng=rng)
        return prog.total_loss(outs), new_state

    grads, new_state = jax.grad(
        lambda p: loss_fn(p, state, inputs, jax.random.PRNGKey(3)),
        has_aux=True,
    )(params)
    gnorm = float(
        jnp.sqrt(
            sum(jnp.sum(jnp.square(g)) for lg in grads.values() for g in lg.values())
        )
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_c3d_resnet18_structural_parity_with_prototxt():
    # native builder vs the imported reference prototxt: identical param
    # shapes for every shared layer name (the transfer-init contract)
    import os

    from eco_tpu.models.c3d_resnet18 import build_c3d_resnet18

    g = build_c3d_resnet18(num_classes=400, batch=1)
    prog = Program(g, train=False)
    data = jnp.zeros((1, 16, 112, 112, 3), jnp.float32)
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    assert params["conv1"]["w"].shape == (3, 7, 7, 3, 64)
    assert params["res5b_2"]["w"].shape == (3, 3, 3, 512, 512)
    outs, _ = prog.apply(params, state, {"data": data})
    assert outs["probs"].shape == (1, 400)

    ref = ("/root/reference/models_ECO_Lite/kinetics/"
           "112_c3d_resnet18_kinetics_rgb_pretrained/"
           "112_c3d_resnet_18_train_val.prototxt")
    if not os.path.exists(ref):
        pytest.skip("reference not mounted")
    from eco_tpu.spec.prototxt import graph_from_prototxt

    gi = graph_from_prototxt(open(ref).read())
    pi = Program(gi, train=False)
    label = jnp.zeros((1,), jnp.int32)
    params_i, state_i = pi.init(
        jax.random.PRNGKey(0), {"data": data, "label": label}
    )
    shared = set(params) & set(params_i)
    assert len(shared) >= 18  # all convs + fc
    for lname in shared:
        for pname in params[lname]:
            assert params[lname][pname].shape == params_i[lname][pname].shape, (
                lname, pname,
                params[lname][pname].shape, params_i[lname][pname].shape,
            )
    # BN stats too
    for lname in set(state) & set(state_i):
        assert state[lname]["mean"].shape == state_i[lname]["mean"].shape
