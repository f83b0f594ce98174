"""Multi-device tests on the 8-device virtual CPU mesh -- coverage the
reference lacks entirely (its MPI paths are only exercised by live mpirun,
SURVEY.md section 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eco_tpu.models import build_eco_lite
from eco_tpu.parallel import (
    make_mesh,
    make_sharded_infer_fn,
    make_sharded_train_step,
    shard_batch,
)
from eco_tpu.runtime import Program
from eco_tpu.spec.netspec import NetBuilder
from eco_tpu.train import SolverConfig, init_train_state, make_train_step


def _small_video_graph(with_loss):
    # ECO-shaped but tiny: 16x16 frames, 4 segments.
    b = NetBuilder("mini_eco")
    x = b.input("data", (8, 4, 16, 16, 3))
    if with_loss:
        b.input("label", (8,))
    x = b.layer("fold", "fold_segments", x)
    x = b.conv_bn_relu("conv1", x, 8, k=3, s=2, p=1)
    x = b.layer("unfold", "unfold_segments", x, num_segments=4)
    x = b.layer(
        "c3d", "convolution", x, num_output=16, kernel_size=(3, 3, 3),
        stride=(2, 2, 2), pad=(1, 1, 1), weight_filler={"type": "xavier"},
    )
    x = b.bn("c3d_bn", x)
    x = b.layer("gap", "global_avg_pool", x)
    y = b.fc("fc", x, 5)
    if with_loss:
        b.layer("loss", "softmaxwithloss", (y, "label"))
    else:
        b.layer("probs", "softmax", y)
    return b.build()


def test_mesh_construction():
    assert len(jax.devices()) == 8
    m = make_mesh()
    assert m.shape == {"data": 8}
    m2 = make_mesh({"data": 4, "segment": -1})
    assert m2.shape == {"data": 4, "segment": 2}
    with pytest.raises(ValueError):
        make_mesh({"data": 3})


@pytest.mark.slow
def test_sharded_train_step_matches_single_device():
    g = _small_video_graph(with_loss=True)
    prog = Program(g, train=True)
    rng = np.random.default_rng(0)
    batch = {
        "data": jnp.asarray(rng.standard_normal((2, 8, 4, 16, 16, 3)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 5, (2, 8))),
    }
    sample = jax.tree.map(lambda x: x[0], batch)
    params, state = prog.init(jax.random.PRNGKey(0), sample)
    cfg = SolverConfig(base_lr=0.1, lr_policy="fixed", iter_size=2,
                       clip_gradients=10.0, solver_type="nesterov")

    # single-device reference
    ts1 = init_train_state(params, state)
    ts1, m1 = jax.jit(make_train_step(prog, cfg))(ts1, batch, jax.random.PRNGKey(7))

    # 8-way data-parallel
    mesh = make_mesh()
    ts2 = init_train_state(params, state)
    step = make_sharded_train_step(prog, cfg, mesh)
    sb = shard_batch(mesh, batch, batch_axis=1)
    ts2, m2 = step(ts2, sb, jax.random.PRNGKey(7))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ts1.params["fc"]["w"]),
        np.asarray(ts2.params["fc"]["w"]),
        rtol=1e-3, atol=1e-5,
    )
    # BN running stats also agree: pjit BN == global-batch (SyncBN) semantics
    # and the single-device run IS the global batch.
    np.testing.assert_allclose(
        np.asarray(ts1.state["c3d_bn"]["mean"]),
        np.asarray(ts2.state["c3d_bn"]["mean"]),
        rtol=1e-3, atol=1e-5,
    )


def test_sharded_inference_matches_local():
    g = _small_video_graph(with_loss=False)
    prog = Program(g, train=False)
    rng = np.random.default_rng(1)
    data = jnp.asarray(rng.standard_normal((8, 4, 16, 16, 3)), jnp.float32)
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    local = prog.apply(params, state, {"data": data})[0]["probs"]
    mesh = make_mesh()
    infer = make_sharded_infer_fn(prog, mesh)
    sharded = infer(params, state, jax.device_put(data))
    np.testing.assert_allclose(np.asarray(local), np.asarray(sharded), rtol=1e-4, atol=1e-6)


def test_eco_lite_multichip_dryrun():
    # The real model, 8-way sharded, tiny spatial size via crop_size override.
    g = build_eco_lite(num_classes=10, num_segments=4, crop_size=64,
                       with_loss=True, batch=8)
    prog = Program(g, train=True)
    rng = np.random.default_rng(2)
    batch = {
        "data": jnp.asarray(rng.standard_normal((1, 8, 4, 64, 64, 3)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 10, (1, 8))),
    }
    params, state = prog.init(jax.random.PRNGKey(0), jax.tree.map(lambda x: x[0], batch))
    mesh = make_mesh()
    cfg = SolverConfig(base_lr=0.001, iter_size=1, clip_gradients=40.0)
    step = make_sharded_train_step(prog, cfg, mesh)
    ts = init_train_state(params, state)
    ts, metrics = step(ts, shard_batch(mesh, batch, batch_axis=1), jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert int(ts.it) == 1


@pytest.mark.slow
def test_segment_sharded_inference_matches_local():
    from eco_tpu.parallel import make_segment_sharded_infer_fn

    g = _small_video_graph(with_loss=False)
    prog = Program(g, train=False)
    rng = np.random.default_rng(3)
    data = jnp.asarray(rng.standard_normal((2, 4, 16, 16, 3)), jnp.float32)
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    local = prog.apply(params, state, {"data": data})[0]["probs"]
    mesh = make_mesh({"data": 2, "segment": 4})
    infer = make_segment_sharded_infer_fn(prog, mesh)
    out = infer(params, state, jax.device_put(data))
    np.testing.assert_allclose(np.asarray(local), np.asarray(out), rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_remat_train_step_matches_plain():
    from eco_tpu.train import make_train_step

    g = _small_video_graph(with_loss=True)
    prog = Program(g, train=True)
    rng = np.random.default_rng(4)
    batch = {
        "data": jnp.asarray(rng.standard_normal((1, 8, 4, 16, 16, 3)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 5, (1, 8))),
    }
    params, state = prog.init(jax.random.PRNGKey(0), jax.tree.map(lambda x: x[0], batch))
    cfg = SolverConfig(base_lr=0.1, lr_policy="fixed", iter_size=1)
    ts1, m1 = jax.jit(make_train_step(prog, cfg))(
        init_train_state(params, state), batch, jax.random.PRNGKey(5)
    )
    ts2, m2 = jax.jit(make_train_step(prog, cfg, remat="dots"))(
        init_train_state(params, state), batch, jax.random.PRNGKey(5)
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ts1.params["fc"]["w"]), np.asarray(ts2.params["fc"]["w"]),
        rtol=1e-4, atol=1e-6,
    )
    # 'nothing' policy too (max remat)
    ts3, m3 = jax.jit(make_train_step(prog, cfg, remat="nothing"))(
        init_train_state(params, state), batch, jax.random.PRNGKey(5)
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m3["loss"]), rtol=1e-5)


def test_mem_param_maps_to_remat_policy():
    from eco_tpu.runtime.memory import remat_policy_from_graph
    from eco_tpu.spec.prototxt import graph_from_prototxt

    g = graph_from_prototxt(
        'name: "x"\nmem_param { optimize_train: true }\n'
        'input: "data"\ninput_dim: 1\ninput_dim: 3\ninput_dim: 8\ninput_dim: 8\n'
    )
    assert remat_policy_from_graph(g) == "dots"
    g2 = graph_from_prototxt(
        'name: "y"\ninput: "data"\ninput_dim: 1\ninput_dim: 3\ninput_dim: 8\ninput_dim: 8\n'
    )
    assert remat_policy_from_graph(g2) is None


def test_gather_scatter_section_layers():
    # Model-parallel "gather section" (reference gather/scatter_layer.cpp):
    # run the FC replicated between Gather and Scatter markers.
    b = NetBuilder("gsec")
    x = b.input("data", (8, 6))
    x = b.fc("fc_in", x, 8)
    x = b.layer("gather1", "gather", x)
    x = b.fc("fc_mid", x, 8)
    x = b.layer("scatter1", "scatter", x)
    y = b.fc("fc_out", x, 4)
    b.layer("probs", "softmax", y)
    g = b.build()
    prog = Program(g, train=False)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((8, 6)), jnp.float32)
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    local = prog.apply(params, state, {"data": data})[0]["probs"]
    mesh = make_mesh()
    with mesh:
        out = jax.jit(lambda p, s, d: prog.apply(p, s, {"data": d})[0]["probs"])(
            params, state, jax.device_put(
                data, jax.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
            )
        )
    np.testing.assert_allclose(np.asarray(local), np.asarray(out), rtol=1e-5, atol=1e-6)


def test_syncbn_explicit_axis_name_matches_global():
    # the explicit shard_map SyncBN path (ops/norm.py axis_name), i.e. the
    # reference sync_bn_layer.cu semantics with per-shard equal counts
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from eco_tpu import ops

    mesh = make_mesh()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, 6, 6, 4)), jnp.float32)
    g = jnp.ones((4,)); b = jnp.zeros((4,))
    rm = jnp.zeros((4,)); rv = jnp.ones((4,))

    @jax.jit
    @partial(
        shard_map, mesh=mesh,
        in_specs=(P("data"), P(), P(), P(), P()),
        out_specs=(P("data"), P(), P()),
    )
    def sync_bn(x, g, b, rm, rv):
        return ops.bn_train(x, g, b, rm, rv, axis_name="data")

    y, nm, nv = sync_bn(x, g, b, rm, rv)
    y_ref, nm_ref, nv_ref = ops.bn_train(x, g, b, rm, rv)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nm), np.asarray(nm_ref), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(nv), np.asarray(nv_ref), rtol=1e-4, atol=1e-6)


def test_tp_inference_matches_local():
    """Channel-sharded (tensor-parallel) weights over a data x model mesh
    must reproduce single-device numerics, and the big weights must actually
    live sharded (1/tp per device)."""
    from eco_tpu.parallel import make_tp_infer_fn, shard_tp_tree

    g = _small_video_graph(with_loss=False)
    prog = Program(g, train=False)
    rng = np.random.default_rng(5)
    data = jnp.asarray(rng.standard_normal((8, 4, 16, 16, 3)), jnp.float32)
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    local = prog.apply(params, state, {"data": data})[0]["probs"]

    mesh = make_mesh({"data": 2, "model": 4})
    sp = shard_tp_tree(mesh, params)
    ss = shard_tp_tree(mesh, state)
    # conv1 w is (3, 3, 3, 8): last dim divisible by tp=4 -> sharded
    w = sp["conv1"]["w"]
    assert w.sharding.spec[-1] == "model"
    assert w.addressable_shards[0].data.shape[-1] == w.shape[-1] // 4
    # fc w is (Din, 5): 5 % 4 != 0 -> replicated
    assert sp["fc"]["w"].sharding.spec == jax.sharding.PartitionSpec()
    infer = make_tp_infer_fn(prog, mesh)
    out = infer(sp, ss, jax.device_put(data))
    np.testing.assert_allclose(np.asarray(local), np.asarray(out),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_tp_train_step_matches_single_device():
    """DP x TP training: sharded weight grads + sharded optimizer update
    must equal the single-device step (params, loss, BN running stats)."""
    from eco_tpu.parallel import (
        make_tp_train_step,
        shard_tp_train_state,
    )

    g = _small_video_graph(with_loss=True)
    prog = Program(g, train=True)
    rng = np.random.default_rng(6)
    batch = {
        "data": jnp.asarray(rng.standard_normal((2, 8, 4, 16, 16, 3)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 5, (2, 8))),
    }
    params, state = prog.init(
        jax.random.PRNGKey(0), jax.tree.map(lambda x: x[0], batch)
    )
    cfg = SolverConfig(base_lr=0.1, lr_policy="fixed", iter_size=2,
                       clip_gradients=10.0, solver_type="nesterov")

    ts1, m1 = jax.jit(make_train_step(prog, cfg))(
        init_train_state(params, state), batch, jax.random.PRNGKey(7)
    )

    mesh = make_mesh({"data": 2, "model": 4})
    ts2 = shard_tp_train_state(mesh, init_train_state(params, state))
    step = make_tp_train_step(prog, cfg, mesh)
    sb = {k: jax.device_put(v, jax.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "data"))) for k, v in batch.items()}
    ts2, m2 = step(ts2, sb, jax.random.PRNGKey(7))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    for lname in ("conv1", "fc"):
        np.testing.assert_allclose(
            np.asarray(ts1.params[lname]["w"]),
            np.asarray(ts2.params[lname]["w"]),
            rtol=1e-3, atol=1e-5,
        )
    np.testing.assert_allclose(
        np.asarray(ts1.state["c3d_bn"]["mean"]),
        np.asarray(ts2.state["c3d_bn"]["mean"]),
        rtol=1e-3, atol=1e-5,
    )
    # momentum history kept its channel sharding through the update
    assert ts2.history["conv1"]["w"].sharding.spec[-1] == "model"


def test_trainer_tp_mesh_wiring():
    """Trainer(mesh=dp x model) routes to the TP step and completes an
    iteration on a sharded TrainState (the `eco train --tp N` path)."""
    from eco_tpu.parallel import shard_tp_train_state
    from eco_tpu.train.loop import Trainer

    g = _small_video_graph(with_loss=True)
    prog = Program(g, train=True)
    rng = np.random.default_rng(7)
    batch = {
        "data": jnp.asarray(rng.standard_normal((1, 8, 4, 16, 16, 3)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 5, (1, 8))),
    }
    mesh = make_mesh({"data": 2, "model": 4})
    cfg = SolverConfig(base_lr=0.01, lr_policy="fixed", iter_size=1,
                       max_iter=2, display=1, test_interval=0)
    trainer = Trainer(prog, cfg, mesh=mesh, log_fn=lambda *_: None)
    ts = trainer.init_state(jax.tree.map(lambda x: x[0], batch))
    ts = shard_tp_train_state(mesh, ts)

    def batches():
        while True:
            yield batch

    ts = trainer.solve(ts, batches())
    assert int(ts.it) == 2
    assert ts.params["conv1"]["w"].sharding.spec[-1] == "model"


@pytest.mark.slow
def test_segment_sharded_train_step_matches_single_device():
    """Sequence-parallel training (data x segment mesh): the 3D head's
    temporal convs run halo-exchanged in fwd AND bwd; params, loss and BN
    stats must equal the single-device step."""
    from eco_tpu.parallel import make_segment_sharded_train_step

    g = _small_video_graph(with_loss=True)
    prog = Program(g, train=True)
    rng = np.random.default_rng(12)
    batch = {
        "data": jnp.asarray(rng.standard_normal((2, 8, 4, 16, 16, 3)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 5, (2, 8))),
    }
    params, state = prog.init(
        jax.random.PRNGKey(0), jax.tree.map(lambda x: x[0], batch)
    )
    cfg = SolverConfig(base_lr=0.1, lr_policy="fixed", iter_size=2,
                       clip_gradients=10.0, solver_type="nesterov")

    ts1, m1 = jax.jit(make_train_step(prog, cfg))(
        init_train_state(params, state), batch, jax.random.PRNGKey(7)
    )

    mesh = make_mesh({"data": 4, "segment": 2})
    step = make_segment_sharded_train_step(prog, cfg, mesh)
    ts2, m2 = step(
        init_train_state(
            jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, state)
        ),
        batch, jax.random.PRNGKey(7),
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    for lname in ("conv1", "c3d", "fc"):
        np.testing.assert_allclose(
            np.asarray(ts1.params[lname]["w"]),
            np.asarray(ts2.params[lname]["w"]),
            rtol=1e-3, atol=1e-5,
        )
    np.testing.assert_allclose(
        np.asarray(ts1.state["c3d_bn"]["mean"]),
        np.asarray(ts2.state["c3d_bn"]["mean"]),
        rtol=1e-3, atol=1e-5,
    )


def test_pp_infer_matches_local():
    """Pipeline-parallel serving: FLOP-balanced stage split over a device
    chain reproduces single-device numerics, with each stage's params
    committed to its own device."""
    from eco_tpu.parallel import make_pp_infer_fn, split_stages

    g = _small_video_graph(with_loss=False)
    prog = Program(g, train=False)
    rng = np.random.default_rng(9)
    data = jnp.asarray(rng.standard_normal((8, 4, 16, 16, 3)), jnp.float32)
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    ref = prog.apply(params, state, {"data": data})[0]["probs"]

    stages = split_stages(prog, {"data": data}, 3, params=params)
    assert len(stages) == 3
    # stages partition the exec layers contiguously
    names = [n for s in stages for n in s.layer_names]
    assert names == [l.name for l in prog.exec_layers]
    # stage boundaries compose: each stage's inputs come from upstream outs
    for a, b in zip(stages, stages[1:]):
        assert set(b.in_names) <= set(a.out_names)

    devs = jax.devices()[:3]
    infer = make_pp_infer_fn(prog, params, state, devs,
                             sample_inputs={"data": data}, microbatches=4)
    out = infer({"data": data})
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-6)


def test_pp_split_respects_shared_param_groups():
    """A cut may not separate cross-layer shared params (param {name}
    ownership, net.cpp): the owner and aliaser stay in one stage so
    Program.apply's owner resolution works inside the stage."""
    from eco_tpu.parallel import make_pp_infer_fn, split_stages
    from eco_tpu.spec.graph import GraphSpec, LayerSpec, ParamSpec

    g = GraphSpec(
        name="sharedpp",
        inputs={"a": (4, 6)},
        layers=[
            LayerSpec("ip1", "innerproduct", ("a",), ("y1",),
                      {"num_output": 6},
                      params=(ParamSpec(name="sw"), ParamSpec())),
            LayerSpec("r1", "relu", ("y1",), ("y1",)),
            LayerSpec("ip2", "innerproduct", ("y1",), ("y2",),
                      {"num_output": 6},
                      params=(ParamSpec(name="sw"), ParamSpec())),
            LayerSpec("ip3", "innerproduct", ("y2",), ("y3",),
                      {"num_output": 3}),
            LayerSpec("sm", "softmax", ("y3",), ("p",)),
        ],
    )
    prog = Program(g, train=False)
    rng = np.random.default_rng(3)
    ins = {"a": jnp.asarray(rng.standard_normal((4, 6)), jnp.float32)}
    params, state = prog.init(jax.random.PRNGKey(0), ins)
    ref = prog.apply(params, state, ins)[0]["p"]

    stages = split_stages(prog, ins, 2, params=params)
    # ip1..ip2 (exec idx 0..2) must be one stage: no cut inside the span
    first = stages[0].layer_names
    assert {"ip1", "ip2"} <= set(first)

    infer = make_pp_infer_fn(prog, params, state, jax.devices()[:2],
                             sample_inputs=ins, output="p", microbatches=2)
    np.testing.assert_allclose(np.asarray(ref),
                               np.asarray(infer(ins)), rtol=1e-5, atol=1e-6)


def test_trainer_sharded_eval_matches_single_device():
    """Trainer(mesh=...) shards eval: global-batch metric tops (the
    reference's SyncOutput/SyncLoss allreduce means, solver.cpp:372-392)
    must equal the single-device run bit-for-tolerance."""
    from eco_tpu.train.loop import SolverConfig, Trainer

    graph = _small_video_graph(with_loss=True)
    # accuracy top for a scalar metric
    prog = Program(graph, train=False)
    data = np.random.default_rng(0).standard_normal(
        (8, 4, 16, 16, 3)).astype(np.float32)
    label = np.arange(8) % 5
    params, state = prog.init(jax.random.PRNGKey(0),
                              {"data": data, "label": label})
    from eco_tpu.train import init_train_state

    ts = init_train_state(params, state)
    batches = [{"data": data, "label": label},
               {"data": data[::-1].copy(), "label": label[::-1].copy()}]

    plain = Trainer(prog, SolverConfig(), test_program=prog,
                    log_fn=lambda *_: None)
    m0 = plain.test(ts, iter(batches))

    mesh = make_mesh({"data": 4}, devices=jax.devices()[:4])
    sharded = Trainer(prog, SolverConfig(), test_program=prog, mesh=mesh,
                      log_fn=lambda *_: None)
    m1 = sharded.test(ts, iter(batches))
    assert m0.keys() == m1.keys() and m0
    for k in m0:
        np.testing.assert_allclose(m0[k], m1[k], rtol=2e-5, atol=1e-6)
