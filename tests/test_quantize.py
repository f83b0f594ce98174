"""int8 post-training quantization (serving-only TPU extension).

No reference counterpart (Caffe serves f32); covers ops/quant.py,
convert/quantize.py and the executor's _QConv/_QInnerProduct impls.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eco_tpu.convert.quantize import calibrate, quantize_for_serving, quantize_graph
from eco_tpu.ops.quant import (
    conv_nd_int8,
    inner_product_int8,
    quantize_act,
    quantize_weight,
)
from eco_tpu.runtime.executor import Program
from eco_tpu.spec.graph import GraphSpec, LayerSpec

from tests.test_parallel import _small_video_graph


def test_quantize_weight_per_channel():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 8)) * np.linspace(0.1, 3, 8),
                    jnp.float32)
    w_q, scale = quantize_weight(w)
    assert w_q.dtype == jnp.int8 and scale.shape == (8,)
    # quantization error bounded by half a step per channel
    err = np.abs(np.asarray(w) - np.asarray(w_q, np.float32) * np.asarray(scale))
    assert (err <= np.asarray(scale) / 2 + 1e-7).all()
    # zero channel -> scale 1, all-zero codes
    wz = w.at[..., 0].set(0.0)
    w_q0, s0 = quantize_weight(wz)
    assert float(s0[0]) == 1.0 and not np.asarray(w_q0)[..., 0].any()


def test_int8_conv_exact_on_integer_grid():
    """With inputs already on the quantization grid the int8 conv is exact:
    the rescaled int32 accumulation reproduces the f32 conv bit-for-bit."""
    from eco_tpu.ops.conv import conv_nd

    rng = np.random.default_rng(1)
    sx = 0.5
    x = jnp.asarray(rng.integers(-100, 100, (2, 9, 9, 4)) * sx, jnp.float32)
    w_int = rng.integers(-100, 100, (3, 3, 4, 6))
    scale = np.abs(w_int).max(axis=(0, 1, 2)) / 127.0
    w = jnp.asarray(w_int * 1.0, jnp.float32)
    w_q, w_s = quantize_weight(w)
    b = jnp.asarray(rng.standard_normal(6), jnp.float32)
    y = conv_nd_int8(x, w_q, w_s, b, act_scale=sx, stride=2, pad=1)
    # reference float conv with the DEQUANTIZED weights (exact quantization
    # here is impossible since scale isn't a divisor of every weight)
    w_dq = jnp.asarray(np.asarray(w_q, np.float32) * scale, jnp.float32)
    ref = conv_nd(x, w_dq, b, stride=2, pad=1)
    # the int8 path accumulates in exact int32; the f32 reference carries
    # ~1e-7 relative accumulation noise at these magnitudes (~1e4)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-2)


def test_inner_product_int8():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((16, 5)), jnp.float32)
    w_q, w_s = quantize_weight(w)
    y = inner_product_int8(x, w_q, w_s, None, act_scale=float(jnp.abs(x).max()) / 127)
    ref = x @ w
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=0.05, atol=0.02)


def test_quantize_act_clips_and_rounds():
    x = jnp.asarray([-300.0, -1.0, 0.26, 200.0], jnp.float32)
    q = quantize_act(x, 1.0)
    assert q.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(q), [-127, -1, 0, 127])


def test_quantize_for_serving_parity():
    """End-to-end: fold BN -> calibrate -> int8 rewrite keeps ECO-shaped
    predictions (argmax identical, probs within PTQ tolerance)."""
    g = _small_video_graph(with_loss=False)
    prog = Program(g, train=False)
    rng = np.random.default_rng(5)
    data = jnp.asarray(rng.standard_normal((8, 4, 16, 16, 3)), jnp.float32)
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    ref = np.asarray(prog.apply(params, state, {"data": data})[0]["probs"])

    qprog, qp, qs, report = quantize_for_serving(
        prog, params, state, [{"data": data}]
    )
    assert set(report["quantized"]) == {"conv1", "c3d", "fc"}
    # BN got folded away before quantization
    assert not any(l.type == "bn" for l in qprog.graph.layers)
    assert all(s > 0 for s in report["act_scales"].values())
    out = np.asarray(qprog.apply(qp, qs, {"data": data})[0]["probs"])
    assert (ref.argmax(-1) == out.argmax(-1)).all()
    np.testing.assert_allclose(ref, out, atol=5e-3)
    # quantized weights really are int8
    assert qp["conv1"]["w"].dtype == jnp.int8
    assert qp["fc"]["w_scale"].shape == (5,)


def test_quantize_graph_skips_degenerate_and_transposed():
    g = GraphSpec(
        name="skips",
        inputs={"a": (2, 8, 8, 3)},
        layers=[
            LayerSpec("dead", "convolution", ("a",), ("y",),
                      {"num_output": 4, "kernel_size": 3, "pad": 1}),
            LayerSpec("up", "deconvolution", ("y",), ("z",),
                      {"num_output": 4, "kernel_size": 2, "stride": 2}),
        ],
    )
    prog = Program(g, train=False)
    data = {"a": jnp.zeros((2, 8, 8, 3), jnp.float32)}
    params, _ = prog.init(jax.random.PRNGKey(0), data)
    # zero calibration input -> act_max 0 -> 'dead' stays float;
    # deconvolution is never rewritten
    qgraph, qp, quantized = quantize_graph(
        g, params, {"dead": 0.0, "up": 3.0}
    )
    assert quantized == []
    assert [l.type for l in qgraph.layers] == ["convolution", "deconvolution"]


def test_quantized_program_shards_under_dp():
    """The int8 graph is a plain GraphSpec: pjit data-parallel eval over a
    mesh reproduces the unsharded quantized numerics."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from eco_tpu.parallel import make_mesh

    g = _small_video_graph(with_loss=False)
    prog = Program(g, train=False)
    rng = np.random.default_rng(7)
    data = jnp.asarray(rng.standard_normal((8, 4, 16, 16, 3)), jnp.float32)
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    qprog, qp, qs, _ = quantize_for_serving(prog, params, state, [{"data": data}])
    ref = np.asarray(qprog.apply(qp, qs, {"data": data})[0]["probs"])

    mesh = make_mesh({"data": 8})

    @jax.jit
    def fwd(p, s, d):
        d = jax.lax.with_sharding_constraint(d, NamedSharding(mesh, P("data")))
        return qprog.apply(p, s, {"data": d})[0]["probs"]

    out = np.asarray(fwd(qp, qs, data))
    np.testing.assert_allclose(ref, out, rtol=1e-5, atol=1e-6)


def test_uint8_server_runs_quantized_program():
    """End-to-end int8 serving: raw uint8 frames -> on-device crop/mean ->
    quantized graph; predictions match the float server's argmax."""
    from eco_tpu.apps import UInt8Server

    g = _small_video_graph(with_loss=False)
    prog = Program(g, train=False)
    rng = np.random.default_rng(8)
    crop = 16
    frames = rng.integers(0, 255, (4, 4, 20, 24, 3), dtype=np.uint8)
    sample = jnp.zeros((4, 4, crop, crop, 3), jnp.float32)
    params, state = prog.init(jax.random.PRNGKey(0), {"data": sample})

    f32_server = UInt8Server(prog, params, state, crop=crop, interpret=True)
    ref = np.asarray(f32_server(jnp.asarray(frames)))

    calib = jnp.asarray(
        rng.standard_normal((4, 4, crop, crop, 3)) * 120, jnp.float32
    )
    qprog, qp, qs, _ = quantize_for_serving(prog, params, state, [{"data": calib}])
    q_server = UInt8Server(qprog, qp, qs, crop=crop, interpret=True)
    out = np.asarray(q_server(jnp.asarray(frames)))
    assert (ref.argmax(-1) == out.argmax(-1)).all()
    np.testing.assert_allclose(ref, out, atol=2e-2)


def test_int8_input_rewrite():
    """Graphs whose input feeds (through layout ops) only quantized layers
    get an input scale; float or mixed consumers return None."""
    from eco_tpu.convert.quantize import int8_input_rewrite

    g = _small_video_graph(with_loss=False)
    prog = Program(g, train=False)
    rng = np.random.default_rng(12)
    data = jnp.asarray(rng.standard_normal((8, 4, 16, 16, 3)) * 100,
                       jnp.float32)
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    qprog, qp, qs, _ = quantize_for_serving(prog, params, state,
                                            [{"data": data}])
    g2, scale = int8_input_rewrite(qprog.graph)
    assert scale is not None and scale > 0
    conv1 = next(l for l in g2.layers if l.name == "conv1")
    assert conv1.type == "qconvolution"
    assert conv1.opt("act_scale") == pytest.approx(scale)
    # float graph: no quantized consumer -> None
    gf, sf = int8_input_rewrite(g)
    assert sf is None and gf is g
    # mixed: input also consumed by a float layer -> unsound, None
    mixed = GraphSpec(
        name="mixed", inputs=dict(qprog.graph.inputs),
        layers=list(qprog.graph.layers) + [
            LayerSpec("peek", "softmax", ("data",), ("peeked",), {}),
        ],
    )
    _, sm = int8_input_rewrite(mixed)
    assert sm is None


def test_uint8_server_int8_input_plane_exact():
    """The fused kernel quantization (preprocess act_scale) is bit-identical
    to the q-layer's own input quantize: int8_input=True/False servers agree
    exactly at f32 compute, and the wire into conv1 really is int8."""
    from eco_tpu.apps import UInt8Server
    from eco_tpu.ops.pallas.preprocess import preprocess_on_device
    from eco_tpu.ops.quant import quantize_act

    g = _small_video_graph(with_loss=False)
    prog = Program(g, train=False)
    rng = np.random.default_rng(13)
    crop = 16
    frames = rng.integers(0, 256, (4, 4, 24, 28, 3), dtype=np.uint8)
    sample = jnp.zeros((4, 4, crop, crop, 3), jnp.float32)
    params, state = prog.init(jax.random.PRNGKey(0), {"data": sample})
    calib = jnp.asarray(
        rng.standard_normal((4, 4, crop, crop, 3)) * 120, jnp.float32
    )
    qprog, qp, qs, _ = quantize_for_serving(prog, params, state,
                                            [{"data": calib}])
    s_off = UInt8Server(qprog, qp, qs, crop=crop, interpret=True,
                        int8_input=False)
    s_on = UInt8Server(qprog, qp, qs, crop=crop, interpret=True)
    assert s_on._in_scale is not None and s_off._in_scale is None
    np.testing.assert_array_equal(
        np.asarray(s_off(jnp.asarray(frames))),
        np.asarray(s_on(jnp.asarray(frames))),
    )
    # kernel emit parity with ops.quant.quantize_act on the float clips
    n = frames.shape[0]
    zeros = jnp.zeros((n,), jnp.int32)
    mirror = jnp.asarray([True, False, True, False])
    f32 = preprocess_on_device(
        jnp.asarray(frames), zeros, zeros, mirror, crop=crop,
        out_dtype=jnp.float32, interpret=True,
    )
    q = preprocess_on_device(
        jnp.asarray(frames), zeros, zeros, mirror, crop=crop,
        interpret=True, act_scale=s_on._in_scale,
    )
    assert q.dtype == jnp.int8
    np.testing.assert_array_equal(
        np.asarray(q), np.asarray(quantize_act(f32, s_on._in_scale))
    )


def test_quantized_program_tensor_parallel():
    """int8 weights channel-shard over a `model` axis like float ones:
    w (.., Cout) and w_scale (Cout,) pick up consistent shardings and the
    TP inference matches local quantized numerics."""
    from eco_tpu.parallel import make_mesh, make_tp_infer_fn, shard_tp_tree

    g = _small_video_graph(with_loss=False)
    prog = Program(g, train=False)
    rng = np.random.default_rng(11)
    data = jnp.asarray(rng.standard_normal((8, 4, 16, 16, 3)), jnp.float32)
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    qprog, qp, qs, _ = quantize_for_serving(prog, params, state, [{"data": data}])
    ref = np.asarray(qprog.apply(qp, qs, {"data": data})[0]["probs"])

    mesh = make_mesh({"data": 2, "model": 4})
    sp_ = shard_tp_tree(mesh, qp)
    ss = shard_tp_tree(mesh, qs)
    assert sp_["conv1"]["w"].dtype == jnp.int8
    assert sp_["conv1"]["w"].sharding.spec[-1] == "model"
    assert sp_["conv1"]["w_scale"].sharding.spec == (("model",))
    infer = make_tp_infer_fn(qprog, mesh)
    out = np.asarray(infer(sp_, ss, jax.device_put(data)))
    np.testing.assert_allclose(ref, out, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_quantize_residual_c3d_resnet():
    """Residual nets: BNs whose conv tops feed the eltwise adds can NOT be
    folded (sole-consumer guard) and become Scale layers; quantization must
    still rewrite every conv/fc and keep predictions."""
    from eco_tpu.models.zoo import get_model

    g = get_model("c3d_resnet18_ucf101", clip_len=8, crop_size=64, batch=4)
    prog = Program(g, train=False)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((4, 8, 64, 64, 3)) * 40, jnp.float32)
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    ref = np.asarray(prog.apply(params, state, {"data": data})[0]["probs"])
    qprog, qp, qs, rep = quantize_for_serving(prog, params, state, [{"data": data}])
    assert len(rep["quantized"]) == 21
    assert sum(l.type == "scale" for l in qprog.graph.layers) == 9
    out = np.asarray(qprog.apply(qp, qs, {"data": data})[0]["probs"])
    assert (ref.argmax(-1) == out.argmax(-1)).all()
    np.testing.assert_allclose(ref, out, atol=5e-2)


def test_quantized_layers_refuse_train_mode():
    """round() has zero gradient a.e. -- a TRAIN-phase quantized graph
    would silently learn nothing, so the q-impls refuse ctx.train."""
    g = _small_video_graph(with_loss=False)
    prog = Program(g, train=False)
    data = jnp.zeros((8, 4, 16, 16, 3), jnp.float32)
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    qprog, qp, qs, _ = quantize_for_serving(prog, params, state, [{"data": data + 1.0}])
    tprog = Program(qprog.graph, train=True)
    with pytest.raises(ValueError, match="serving-only"):
        tprog.apply(qp, qs, {"data": data}, rng=jax.random.PRNGKey(0))


def test_export_rejects_quantized_graph(tmp_path):
    """Caffe has no int8 wire format: exporting a quantized graph must fail
    loudly instead of silently writing a caffemodel with no conv weights."""
    from eco_tpu.convert import export_caffe_weights

    g = _small_video_graph(with_loss=False)
    prog = Program(g, train=False)
    data = jnp.zeros((8, 4, 16, 16, 3), jnp.float32)
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    qgraph, qp, _ = quantize_graph(
        g, params, {"conv1": 1.0, "c3d": 1.0, "fc": 1.0}
    )
    with pytest.raises(ValueError, match="int8"):
        export_caffe_weights(qgraph, qp, state, str(tmp_path / "x.caffemodel"))


def test_cli_quantize_deploy_random_calibration(tmp_path, capsys):
    """eco quantize on a deploy net without --list: ONE random calibration
    batch containing ALL declared inputs (not one dict per input)."""
    import json

    from eco_tpu.spec.prototxt import graph_from_prototxt
    from eco_tpu.tools.cli import main
    from eco_tpu.train import save_model

    NET = """
name: "tinydeploy"
input: "data"
input_dim: 2 input_dim: 3 input_dim: 16 input_dim: 16
layer { name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  convolution_param { num_output: 8 kernel_size: 3 pad: 1 } }
layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
layer { name: "fc" type: "InnerProduct" bottom: "conv1" top: "fc"
  inner_product_param { num_output: 4 } }
layer { name: "prob" type: "Softmax" bottom: "fc" top: "prob" }
"""
    net = tmp_path / "net.prototxt"
    net.write_text(NET)
    g = graph_from_prototxt(NET)
    prog = Program(g, train=False)
    sample = {k: jnp.zeros(s, jnp.float32) for k, s in g.inputs.items()}
    params, state = prog.init(jax.random.PRNGKey(0), sample)
    save_model(str(tmp_path / "m"), params, state)
    out = str(tmp_path / "int8")
    main(["quantize", "--net", str(net), "--weights",
          str(tmp_path / "m.npz"), "-o", out])
    assert "random data" in capsys.readouterr().out
    gq = json.load(open(out + ".graph.json"))
    assert sorted({l["type"] for l in gq["layers"]}) == [
        "qconvolution", "qinnerproduct", "relu", "softmax"
    ]


def test_calibrate_takes_max_over_batches():
    g = _small_video_graph(with_loss=False)
    prog = Program(g, train=False)
    small = {"data": jnp.full((8, 4, 16, 16, 3), 0.5, jnp.float32)}
    big = {"data": jnp.full((8, 4, 16, 16, 3), 2.0, jnp.float32)}
    params, state = prog.init(jax.random.PRNGKey(0), small)
    m = calibrate(prog, params, state, [small, big])
    assert m["conv1"] == pytest.approx(2.0)


# -- int8 chain fusion (convert.quantize.chain_int8) -----------------------

def _chain_graph():
    """conv1 -> relu -> conv2 -> eltwise(+skip) -> relu -> conv3 (the 3D-res
    pattern) plus an AVE-pool side branch off t1 into conv4 (the inception
    pool-branch pattern): every chain_int8 structural case."""
    return GraphSpec(
        name="chain",
        inputs={"a": (2, 8, 8, 4)},
        layers=[
            LayerSpec("conv1", "convolution", ("a",), ("t1",),
                      {"num_output": 8, "kernel_size": 3, "pad": 1}),
            LayerSpec("relu1", "relu", ("t1",), ("t1",), {}),
            LayerSpec("conv2", "convolution", ("t1",), ("t2",),
                      {"num_output": 8, "kernel_size": 3, "pad": 1}),
            LayerSpec("add", "eltwise", ("t1", "t2"), ("t3",),
                      {"operation": "sum"}),
            LayerSpec("relu3", "relu", ("t3",), ("t3",), {}),
            LayerSpec("conv3", "convolution", ("t3",), ("t5",),
                      {"num_output": 8, "kernel_size": 1}),
            LayerSpec("pool", "pooling", ("t1",), ("t4",),
                      {"pool": "ave", "kernel_size": 2, "stride": 2}),
            LayerSpec("conv4", "convolution", ("t4",), ("t6",),
                      {"num_output": 8, "kernel_size": 1}),
        ],
    )


def test_chain_int8_rewrites_and_matches_unchained():
    g = _chain_graph()
    prog = Program(g, train=False)
    rng = np.random.default_rng(3)
    data = {"a": jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)}
    params, state = prog.init(jax.random.PRNGKey(0), data)
    q1, p1, s1, r1 = quantize_for_serving(prog, params, state, [data],
                                          fold=False, chain=False)
    q2, p2, s2, r2 = quantize_for_serving(prog, params, state, [data],
                                          fold=False, chain=True)
    assert set(r1["quantized"]) == {"conv1", "conv2", "conv3", "conv4"}
    # conv1 chains (consumers: conv2 via relu, eltwise w/ conv3 hint, AVE
    # pool accepting); conv2 chains (consumer: eltwise, hint from conv3);
    # conv3/conv4 outputs are graph outputs -> stay float
    assert set(r2["chained"]) == {"conv1", "conv2"}
    by_name = {l.name: l for l in q2.graph.layers}
    assert by_name["conv1"].opt("out_scale") is not None
    assert by_name["conv3"].opt("out_scale") is None
    # conv2 consumes conv1's int8 at the exact emitted scale
    assert by_name["conv2"].opt("act_scale") == pytest.approx(
        by_name["conv1"].opt("out_scale"))
    # eltwise dequants its int8 inputs in-op
    assert by_name["add"].opt("in_scales") is not None
    # AVE pool side branch dequants conv1's int8 in-op
    assert by_name["pool"].opt("in_scale") == pytest.approx(
        by_name["conv1"].opt("out_scale"))
    o1 = np.asarray(q1.apply(p1, s1, data)[0]["t5"])
    o2 = np.asarray(q2.apply(p2, s2, data)[0]["t5"])
    ref = np.asarray(prog.apply(params, state, data)[0]["t5"])
    scale = np.abs(ref).max()
    # chaining may add at most a little extra quantization error
    assert np.abs(o2 - ref).max() <= max(2 * np.abs(o1 - ref).max(),
                                         0.05 * scale)


def test_chain_int8_intermediate_tensors_are_int8():
    """The wire format really is int8: capture the chained conv's top."""
    g = _chain_graph()
    prog = Program(g, train=False)
    rng = np.random.default_rng(4)
    data = {"a": jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)}
    params, state = prog.init(jax.random.PRNGKey(0), data)
    q2, p2, s2, r2 = quantize_for_serving(prog, params, state, [data],
                                          fold=False, chain=True)
    outs, _ = q2.apply(p2, s2, data, capture=["t2"])
    assert outs["t2"].dtype == jnp.int8


def test_chain_int8_respects_float_consumer_boundary():
    """A non-quantizable consumer (softmax) keeps the producer float."""
    g = GraphSpec(
        name="edge",
        inputs={"a": (2, 16)},
        layers=[
            LayerSpec("fc1", "innerproduct", ("a",), ("h",),
                      {"num_output": 8}),
            LayerSpec("fc2", "innerproduct", ("h",), ("y",),
                      {"num_output": 4}),
            LayerSpec("prob", "softmax", ("y",), ("p",), {}),
        ],
    )
    prog = Program(g, train=False)
    rng = np.random.default_rng(5)
    data = {"a": jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)}
    params, state = prog.init(jax.random.PRNGKey(0), data)
    q, p, s, r = quantize_for_serving(prog, params, state, [data],
                                      fold=False, chain=True)
    by_name = {l.name: l for l in q.graph.layers}
    assert r["chained"] == ["fc1"]
    assert by_name["fc2"].opt("out_scale") is None  # softmax consumer
    out = np.asarray(q.apply(p, s, data)[0]["p"])
    ref = np.asarray(prog.apply(params, state, data)[0]["p"])
    np.testing.assert_allclose(out, ref, atol=0.05)


def test_int8_input_rewrite_data_layer_top():
    """A train/val-style graph has no declared inputs -- 'data' is a
    bottom-less Data/VideoData layer's TOP.  The producer must not end the
    tracked range (it IS the feed), or the wire-int8 plane silently no-ops
    on exactly the graphs eco aot --int8 --uint8 serves."""
    from eco_tpu.convert.quantize import int8_input_rewrite

    g = _small_video_graph(with_loss=False)
    prog = Program(g, train=False)
    rng = np.random.default_rng(21)
    data = jnp.asarray(rng.standard_normal((8, 4, 16, 16, 3)) * 100,
                       jnp.float32)
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    qprog, _, _, _ = quantize_for_serving(prog, params, state,
                                          [{"data": data}])
    fed = GraphSpec(
        name="fed", inputs={},
        layers=[LayerSpec("feed", "videodata", (), ("data", "label"), {})]
        + list(qprog.graph.layers),
    )
    g2, scale = int8_input_rewrite(fed)
    assert scale is not None and scale > 0
    conv1 = next(l for l in g2.layers if l.name == "conv1")
    assert conv1.opt("act_scale") == pytest.approx(scale)
