"""Prototxt import, caffemodel wire parsing, weight import, BN folding."""

import os
import torch
import struct

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eco_tpu.spec.prototxt import graph_from_prototxt, parse_prototxt
from eco_tpu.convert import fold_bn, import_caffe_weights, load_caffemodel
from eco_tpu.runtime import Program
from eco_tpu.spec.netspec import NetBuilder

REF = "/root/reference"


# ------------------------------------------------------------- text format


def test_parse_prototxt_basics():
    d = parse_prototxt(
        '''
        name: "o3d"
        mem_param { optimize_test: true }
        layer {
          name: "c" type: "Convolution" bottom: "data" top: "c"
          convolution_param {
            num_output: 128
            pad: [1, 1, 1]
            kernel_size: [3, 3, 3]
            stride: [2, 2, 2]
          }
          param { lr_mult: 1 decay_mult: 1 } param { lr_mult: 2 decay_mult: 0 }
        }
        layer { name: "p" type: "Pooling" bottom: "c" top: "p"
                pooling_param { pool: MAX kernel_size: 3 stride: 2 } }
        '''
    )
    assert d["name"] == "o3d"
    assert d["mem_param"]["optimize_test"] is True
    layers = d["layer"]
    assert layers[0]["convolution_param"]["kernel_size"] == [3, 3, 3]
    assert layers[0]["param"][0]["lr_mult"] == 1
    assert layers[1]["pooling_param"]["pool"] == "MAX"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
@pytest.mark.slow
def test_import_eco_lite_deploy_prototxt_and_run():
    text = open(f"{REF}/models_ECO_Lite/kinetics/deploy.prototxt").read()
    g = graph_from_prototxt(text)
    # deploy inputs are converted to physical channels-last
    assert g.inputs["data"] == (80, 224, 224, 3)
    # r2Dto3D + Permute got fused into unfold_segments
    unfolds = [l for l in g.layers if l.type == "unfold_segments"]
    assert len(unfolds) == 1 and unfolds[0].opt("num_segments") == 16
    assert not any(l.type == "permute" for l in g.layers)

    prog = Program(g, train=False)
    # 5 videos x 16 segments, small batch for CPU: use 16 rows (1 video)
    data = jnp.asarray(
        np.random.default_rng(0).standard_normal((16, 224, 224, 3)), jnp.float32
    )
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    assert params["res3a_2n"]["w"].shape == (3, 3, 3, 96, 128)
    outs, _ = prog.apply(params, state, {"data": data})
    assert outs["fc8"].shape == (1, 400)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
@pytest.mark.slow
def test_import_eco_lite_train_prototxt_phases():
    text = open(f"{REF}/models_ECO_Lite/kinetics/ECO_Lite.prototxt").read()
    g = graph_from_prototxt(text)
    # VideoData train/test variants + phase-filtered programs
    train_prog = Program(g, train=True)
    test_prog = Program(g, train=False)
    assert "data" in train_prog.input_names and "label" in train_prog.input_names
    folds = [l for l in g.layers if l.type == "fold_segments"]
    assert folds and folds[0].name == "reshape_data"
    # train program: loss present, accuracy absent
    assert "loss" in [l.name for l in train_prog.exec_layers]
    assert not any(l.name == "top1" for l in train_prog.exec_layers)
    assert any(l.name == "top5" for l in test_prog.exec_layers)
    # run the train graph once at small batch
    data = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 16, 224, 224, 3)), jnp.float32
    )
    label = jnp.asarray([3])
    params, state = train_prog.init(jax.random.PRNGKey(0), {"data": data, "label": label})
    outs, new_state = train_prog.apply(
        params, state, {"data": data, "label": label}, rng=jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(outs["loss"]))


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_import_eco_full_prototxt():
    text = open(f"{REF}/models_ECO_Full/kinetics/ECO_full.prototxt").read()
    g = graph_from_prototxt(text)
    cons = [l for l in g.layers if l.type == "segment_consensus"]
    assert len(cons) == 1 and cons[0].opt("num_segments") == 16
    prog = Program(g, train=False)
    data = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 16, 224, 224, 3)), jnp.float32
    )
    label = jnp.asarray([3])
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data, "label": label})
    assert params["fc8N"]["w"].shape == (1536, 400)


# ------------------------------------------------------------- wire format


def _varint(n):
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        out += bytes([b7 | (0x80 if n else 0)])
        if not n:
            return out


def _tag(field, wt):
    return _varint((field << 3) | wt)


def _ld(field, payload):
    return _tag(field, 2) + _varint(len(payload)) + payload


def _blob(arr, *, legacy=False, packed=True):
    arr = np.asarray(arr, np.float32)
    msg = b""
    if legacy:
        shape4 = (1,) * (4 - arr.ndim) + arr.shape
        for i, d in enumerate(shape4):
            msg += _tag(i + 1, 0) + _varint(d)
    else:
        shape_msg = b"".join(_tag(1, 0) + _varint(d) for d in arr.shape)
        msg += _ld(7, shape_msg)
    if packed:
        msg += _ld(5, arr.ravel().tobytes())
    else:
        for v in arr.ravel():
            msg += _tag(5, 5) + struct.pack("<f", v)
    return msg


def _make_caffemodel(layers, v1=False):
    """layers: [(name, type, [arrays])]"""
    out = _ld(1, b"testnet")
    for name, ltype, blobs in layers:
        if v1:
            msg = _ld(4, name.encode()) + _tag(5, 0) + _varint(4)  # CONV enum
            for b in blobs:
                msg += _ld(6, _blob(b, legacy=True))
            out += _ld(2, msg)
        else:
            msg = _ld(1, name.encode()) + _ld(2, ltype.encode())
            for b in blobs:
                msg += _ld(7, _blob(b))
            out += _ld(100, msg)
    return out


def test_caffemodel_wire_roundtrip(tmp_path):
    w = np.arange(24, dtype=np.float32).reshape(2, 3, 2, 2)
    b = np.asarray([1.0, 2.0], np.float32)
    path = tmp_path / "m.caffemodel"
    path.write_bytes(_make_caffemodel([("convX", "Convolution", [w, b])]))
    layers = load_caffemodel(str(path))
    assert set(layers) == {"convX"}
    np.testing.assert_array_equal(layers["convX"]["blobs"][0], w)
    np.testing.assert_array_equal(layers["convX"]["blobs"][1], b)
    # V1 legacy format + unpacked floats
    path2 = tmp_path / "v1.caffemodel"
    path2.write_bytes(_make_caffemodel([("c1", "Convolution", [b])], v1=True))
    l2 = load_caffemodel(str(path2))
    np.testing.assert_array_equal(l2["c1"]["blobs"][0].reshape(-1), b)


def _mini_graph():
    b = NetBuilder("mini")
    x = b.input("data", (2, 8, 8, 3))
    x = b.conv("conv1", x, 4, k=3, p=1)
    x = b.bn("conv1_bn", x)
    x = b.relu("conv1_relu", x)
    y = b.conv("res_a", x, 4, k=1)  # feeds both bn and eltwise (unfoldable BN)
    yb = b.bn("res_a_bn", y)
    yb = b.relu("res_a_relu", yb)
    z = b.conv("res_b", yb, 4, k=1)
    s = b.eltwise_sum("res", [z, y])
    s = b.bn("res_bn", s)
    x = b.layer("gap", "global_avg_pool", s)
    b.fc("fc", x, 5)
    return b.build()


def test_import_caffe_weights_layouts(tmp_path):
    g = _mini_graph()
    prog = Program(g, train=False)
    data = jnp.zeros((2, 8, 8, 3))
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    rng = np.random.default_rng(0)
    w_oihw = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)
    bias = rng.standard_normal(4).astype(np.float32)
    gm = rng.standard_normal((1, 4, 1, 1)).astype(np.float32)
    bt = rng.standard_normal((1, 4, 1, 1)).astype(np.float32)
    mu = rng.standard_normal((1, 4, 1, 1)).astype(np.float32)
    var = (rng.random((1, 4, 1, 1)) + 0.5).astype(np.float32)
    fcw = rng.standard_normal((5, 4)).astype(np.float32)
    fcb = rng.standard_normal(5).astype(np.float32)
    path = tmp_path / "w.caffemodel"
    path.write_bytes(
        _make_caffemodel(
            [
                ("conv1", "Convolution", [w_oihw, bias]),
                ("conv1_bn", "BN", [gm, bt, mu, var]),
                ("fc", "InnerProduct", [fcw, fcb]),
                ("notinmodel", "Convolution", [bias]),
            ]
        )
    )
    p2, s2, report = import_caffe_weights(g, params, state, str(path))
    assert "conv1" in report["loaded"] and "notinmodel" in report["skipped"]
    np.testing.assert_array_equal(
        np.asarray(p2["conv1"]["w"]), np.transpose(w_oihw, (2, 3, 1, 0))
    )
    np.testing.assert_array_equal(np.asarray(p2["fc"]["w"]), fcw.T)
    np.testing.assert_array_equal(np.asarray(s2["conv1_bn"]["var"]), var.reshape(-1))
    # inv_std style conversion
    p3, s3, _ = import_caffe_weights(g, params, state, str(path), bn_style="inv_std")
    np.testing.assert_allclose(
        np.asarray(s3["conv1_bn"]["var"]),
        var.reshape(-1) ** -2 - 1e-5,
        rtol=1e-5,
    )


def test_fold_bn_preserves_outputs_and_guards_residuals():
    g = _mini_graph()
    prog = Program(g, train=False)
    data = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 8, 8, 3)), jnp.float32
    )
    params, state = prog.init(jax.random.PRNGKey(1), {"data": data})
    # randomize BN stats so folding is non-trivial
    rng = np.random.default_rng(2)
    for lname in ("conv1_bn", "res_a_bn", "res_bn"):
        params[lname]["gamma"] = jnp.asarray(rng.standard_normal(4), jnp.float32)
        params[lname]["beta"] = jnp.asarray(rng.standard_normal(4), jnp.float32)
        state[lname]["mean"] = jnp.asarray(rng.standard_normal(4), jnp.float32)
        state[lname]["var"] = jnp.asarray(rng.random(4) + 0.2, jnp.float32)
    ref_out = prog.apply(params, state, {"data": data})[0]["fc"]

    fg, fp, fs = fold_bn(g, params, state)
    types = {l.name: l.type for l in fg.layers}
    assert "conv1_bn" not in types  # folded into conv1
    # res_a feeds both its BN and the eltwise -> BN must NOT fold
    assert types["res_a_bn"] == "scale"
    assert types["res_bn"] == "scale"  # eltwise producer is unfoldable
    fprog = Program(fg, train=False)
    out = fprog.apply(fp, fs, {"data": data})[0]["fc"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
@pytest.mark.slow
def test_import_bn_inception_deploy():
    # the 2D init model used by run.sh transfer init (232 layers)
    path = (
        f"{REF}/models_ECO_Lite/kinetics/bn_inception_kinetics_rgb_pretrained/"
        "bn_inception_rgb_deploy.prototxt"
    )
    g = graph_from_prototxt(open(path).read())
    prog = Program(g, train=False)
    data = jnp.zeros(g.inputs["data"], jnp.float32)
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    assert "inception_5b_pool_proj" in params
    outs, _ = prog.apply(params, state, {"data": data})
    (final,) = [v for v in outs.values()]
    assert final.shape[0] == data.shape[0]


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
@pytest.mark.slow
def test_import_c3d_resnet18_trainval():
    # the 3D init model: dense 16-frame clip, length_first layout
    path = (
        f"{REF}/models_ECO_Lite/kinetics/112_c3d_resnet18_kinetics_rgb_pretrained/"
        "112_c3d_resnet_18_train_val.prototxt"
    )
    g = graph_from_prototxt(open(path).read())
    # the 5D data reshape lowered to identity (layout-native)
    kinds = {l.name: l.type for l in g.layers}
    assert kinds["data_reshape"] == "identity"
    prog = Program(g, train=True)
    data = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16, 112, 112, 3)),
        jnp.float32,
    )
    label = jnp.asarray([1, 2])
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data, "label": label})
    assert params["conv1_s"]["w"].shape[-2] == 3 if "conv1_s" in params else True
    outs, _ = prog.apply(params, state, {"data": data, "label": label},
                         rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(outs["loss"]))


def test_new_style_batchnorm_scale_pair(tmp_path):
    # Caffe "BatchNorm"+"Scale" pair (post-2015 style) import + execution
    text = '''
    name: "bnscale"
    input: "data"
    input_dim: 2 input_dim: 3 input_dim: 8 input_dim: 8
    layer { name: "conv" type: "Convolution" bottom: "data" top: "conv"
      convolution_param { num_output: 4 kernel_size: 3 pad: 1 } }
    layer { name: "bn" type: "BatchNorm" bottom: "conv" top: "conv"
      batch_norm_param { use_global_stats: true } }
    layer { name: "sc" type: "Scale" bottom: "conv" top: "conv"
      scale_param { bias_term: true } }
    layer { name: "relu" type: "ReLU" bottom: "conv" top: "conv" }
    '''
    g = graph_from_prototxt(text)
    prog = Program(g, train=False)
    data = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 8, 8, 3)), jnp.float32
    )
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    assert "mean" in state["bn"] and "scale" in params["sc"]
    # caffemodel import with scale_factor normalization
    rngv = np.random.default_rng(1)
    mean = rngv.standard_normal((1, 4, 1, 1)).astype(np.float32)
    var = (rngv.random((1, 4, 1, 1)) + 0.5).astype(np.float32)
    factor = np.asarray([2.0], np.float32)
    sc_w = rngv.standard_normal(4).astype(np.float32)
    sc_b = rngv.standard_normal(4).astype(np.float32)
    path = tmp_path / "bns.caffemodel"
    path.write_bytes(_make_caffemodel([
        ("bn", "BatchNorm", [mean, var, factor]),
        ("sc", "Scale", [sc_w, sc_b]),
    ]))
    p2, s2, rep = import_caffe_weights(g, params, state, str(path))
    np.testing.assert_allclose(np.asarray(s2["bn"]["mean"]),
                               mean.reshape(-1) / 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p2["sc"]["scale"]), sc_w)
    outs, _ = prog.apply(p2, s2, {"data": data})
    assert np.isfinite(np.asarray(outs["conv"])).all()


def test_lrn_and_activation_layers():
    text = '''
    name: "acts"
    input: "data"
    input_dim: 2 input_dim: 4 input_dim: 6 input_dim: 6
    layer { name: "lrn" type: "LRN" bottom: "data" top: "lrn"
      lrn_param { local_size: 3 alpha: 0.5 beta: 0.75 } }
    layer { name: "sig" type: "Sigmoid" bottom: "lrn" top: "sig" }
    layer { name: "tanh" type: "TanH" bottom: "sig" top: "tanh" }
    layer { name: "abs" type: "AbsVal" bottom: "tanh" top: "abs" }
    '''
    g = graph_from_prototxt(text)
    prog = Program(g, train=False)
    data = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 6, 6, 4)), jnp.float32
    )
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    outs, _ = prog.apply(params, state, {"data": data})
    # LRN vs torch
    import torch.nn.functional as TF
    ref = TF.local_response_norm(
        torch.from_numpy(np.moveaxis(np.asarray(data), -1, 1)),
        size=3, alpha=0.5, beta=0.75, k=1.0,
    ).numpy()
    from eco_tpu.ops.elementwise import lrn
    got = np.moveaxis(np.asarray(lrn(data, local_size=3, alpha=0.5, beta=0.75)), -1, 1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
    assert np.all(np.asarray(outs["abs"]) >= 0)


def test_split_and_state_rules():
    text = '''
    name: "rules"
    input: "data"
    input_dim: 2 input_dim: 4
    layer { name: "split" type: "Split" bottom: "data" top: "a" top: "b" }
    layer { name: "fca" type: "InnerProduct" bottom: "a" top: "fca"
      inner_product_param { num_output: 3 } }
    layer { name: "dbg" type: "InnerProduct" bottom: "b" top: "dbg"
      inner_product_param { num_output: 2 }
      include { phase: TEST stage: "debug" min_level: 1 } }
    '''
    g = graph_from_prototxt(text)
    # without the stage, the staged layer is filtered out
    base = g.filtered("test")
    assert not any(l.name == "dbg" for l in base.layers)
    staged = g.filtered("test", stages=("debug",), level=1)
    assert any(l.name == "dbg" for l in staged.layers)
    assert not any(
        l.name == "dbg" for l in g.filtered("test", stages=("debug",), level=0).layers
    )
    prog = Program(g, train=False)
    data = jnp.ones((2, 4))
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    outs, _ = prog.apply(params, state, {"data": data})
    assert outs["fca"].shape == (2, 3)


def test_prototxt_parser_edge_cases():
    d = parse_prototxt(
        '''
        # full-line comment
        name: "edge\\"case"  # trailing comment
        input: "data"
        input_dim: 1 input_dim: 3 input_dim: 8 input_dim: 8
        layer {
          name: "p" type: "Power" bottom: "data" top: "p"
          power_param { power: -0.5 scale: 1e-3 shift: 2.5e+1 }
        }
        '''
    )
    assert d["layer"]["power_param"]["power"] == -0.5
    assert d["layer"]["power_param"]["scale"] == 1e-3
    assert d["layer"]["power_param"]["shift"] == 25.0
    g = graph_from_prototxt(
        'name: "x"\ninput: "data"\ninput_dim: 1 input_dim: 3 '
        'input_dim: 8 input_dim: 8\n'
        'layer { name: "c" type: "Convolution" bottom: "data" top: "c"\n'
        '  convolution_param { num_output: 2 kernel_size: 3 dilation: 2 } }\n'
    )
    assert g.layer("c").opt("dilation") == 2


def test_dilated_conv_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 12, 12, 3)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 3, 4)) * 0.2).astype(np.float32)
    from eco_tpu import ops

    y = ops.conv2d(jnp.asarray(x), jnp.asarray(w), pad=2, dilation=2)
    import torch.nn.functional as TF
    ref = TF.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(w).permute(3, 2, 0, 1),
        padding=2, dilation=2,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-4, atol=2e-4)


def test_caffemodel_truncated_and_garbage(tmp_path):
    # truncated file -> clean python exception, not a hang/crash
    w = np.arange(6, dtype=np.float32)
    good = _make_caffemodel([("c", "Convolution", [w])])
    bad = tmp_path / "trunc.caffemodel"
    bad.write_bytes(good[: len(good) // 2])
    with pytest.raises((ValueError, IndexError)):
        load_caffemodel(str(bad))
    # a blob whose data length disagrees with its shape
    junk = tmp_path / "shape.caffemodel"
    msg = _ld(1, b"c") + _ld(2, b"Convolution") + _ld(
        7, _ld(7, _tag(1, 0) + _varint(99)) + _ld(5, w.tobytes())
    )
    junk.write_bytes(_ld(100, msg))
    with pytest.raises(ValueError, match="blob data size"):
        load_caffemodel(str(junk))


def test_v1_text_prototxt_upgrade():
    """V1 'layers { type: ENUM blobs_lr ... }' text nets import directly
    (upgrade_proto.cpp UpgradeV1Net parity, VERDICT r1 missing #5)."""
    text = '''
name: "v1net"
input: "data"
input_dim: 1 input_dim: 3 input_dim: 8 input_dim: 8
layers {
  name: "conv1" type: CONVOLUTION bottom: "data" top: "conv1"
  blobs_lr: 1 blobs_lr: 2
  weight_decay: 1 weight_decay: 0
  param: "shared_conv_w" param: "shared_conv_b"
  convolution_param { num_output: 4 kernel_size: 3 pad: 1 }
}
layers { name: "relu1" type: RELU bottom: "conv1" top: "conv1" }
layers { name: "pool1" type: POOLING bottom: "conv1" top: "pool1"
  pooling_param { pool: MAX kernel_size: 2 stride: 2 } }
layers { name: "fc" type: INNER_PRODUCT bottom: "pool1" top: "fc"
  inner_product_param { num_output: 5 } }
layers { name: "prob" type: SOFTMAX bottom: "fc" top: "prob" }
'''
    g = graph_from_prototxt(text)
    types = [l.type for l in g.layers]
    assert types == ["convolution", "relu", "pooling", "innerproduct", "softmax"]
    conv = g.layer("conv1")
    assert conv.params[0].lr_mult == 1 and conv.params[1].lr_mult == 2
    assert conv.params[0].decay_mult == 1 and conv.params[1].decay_mult == 0
    assert conv.params[0].name == "shared_conv_w"
    prog = Program(g, train=False)
    data = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 8, 8, 3)), jnp.float32
    )
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    outs, _ = prog.apply(params, state, {"data": data})
    assert outs["prob"].shape == (1, 5)

    # V0 (nested layer message) now MIGRATES (test_v0_prototxt_upgrade_and
    # _run); a malformed V0 net with an undeclared blob still fails loudly
    # instead of being silently misparsed.
    import pytest

    with pytest.raises(ValueError, match="unknown blob"):
        graph_from_prototxt(
            'layers { layer { name: "c" type: "conv" num_output: 2 } '
            'bottom: "data" top: "c" }'
        )


def test_format_prototxt_roundtrip_and_upgrade_cli(tmp_path):
    """format_prototxt inverts parse_prototxt, and `eco upgrade` writes a V2
    text file that imports to the same graph as the V1 original
    (tools/upgrade_net_proto_text.cpp parity)."""
    from eco_tpu.spec.prototxt import format_prototxt, upgrade_v1_net
    from eco_tpu.tools.cli import main as cli_main

    v1 = '''
name: "v1net"
input: "data"
input_dim: 1 input_dim: 3 input_dim: 8 input_dim: 8
layers {
  name: "conv1" type: CONVOLUTION bottom: "data" top: "conv1"
  blobs_lr: 1 blobs_lr: 2
  convolution_param { num_output: 4 kernel_size: 3 pad: 1 }
}
layers { name: "relu1" type: RELU bottom: "conv1" top: "conv1" }
layers { name: "pool1" type: POOLING bottom: "conv1" top: "pool1"
  pooling_param { pool: MAX kernel_size: 2 stride: 2 } }
layers { name: "prob" type: SOFTMAX bottom: "pool1" top: "prob" }
'''
    # pure round-trip: parse(format(net)) == net (incl. enum vs string split)
    net = upgrade_v1_net(parse_prototxt(v1))
    assert parse_prototxt(format_prototxt(net)) == net

    src = tmp_path / "v1.prototxt"
    dst = tmp_path / "v2.prototxt"
    src.write_text(v1)
    cli_main(["upgrade", str(src), str(dst)])
    out = dst.read_text()
    assert "layers" not in out.split("conv1")[0]  # V2 uses `layer {`
    assert 'type: "Convolution"' in out and "pool: MAX" in out

    g1 = graph_from_prototxt(v1)
    g2 = graph_from_prototxt(out)
    assert [l.type for l in g1.layers] == [l.type for l in g2.layers]
    assert [l.name for l in g1.layers] == [l.name for l in g2.layers]
    assert g1.layer("conv1").params[1].lr_mult == g2.layer("conv1").params[1].lr_mult == 2

    # already-V2 files pass through unchanged semantically
    dst2 = tmp_path / "v2b.prototxt"
    cli_main(["upgrade", str(dst), str(dst2)])
    assert parse_prototxt(dst2.read_text()) == parse_prototxt(out)


def test_v0_prototxt_upgrade_and_run():
    """V0 text nets (nested layer{} inside layers{}, flat fields, standalone
    padding layers) migrate through upgrade_v0_net -> upgrade_v1_net and
    execute (upgrade_proto.cpp UpgradeV0Net/UpgradeV0PaddingLayers)."""
    import warnings

    from eco_tpu.spec.prototxt import graph_from_prototxt

    text = """
name: "v0net"
input: "data"
input_dim: 1 input_dim: 3 input_dim: 10 input_dim: 10
layers {
  layer { name: "pad1" type: "padding" pad: 2 }
  bottom: "data" top: "pad1" }
layers {
  layer { name: "conv1" type: "conv" num_output: 4 kernelsize: 5 stride: 1
          group: 1 biasterm: true blobs_lr: 1. blobs_lr: 2. }
  bottom: "pad1" top: "conv1" }
layers {
  layer { name: "relu1" type: "relu" }
  bottom: "conv1" top: "conv1" }
layers {
  layer { name: "pool1" type: "pool" pool: MAX kernelsize: 2 stride: 2 }
  bottom: "conv1" top: "pool1" }
layers {
  layer { name: "fc" type: "innerproduct" num_output: 3 }
  bottom: "pool1" top: "fc" }
layers {
  layer { name: "prob" type: "softmax" }
  bottom: "fc" top: "prob" }
"""
    g = graph_from_prototxt(text)
    names = [l.name for l in g.layers]
    assert "pad1" not in names  # padding absorbed
    conv = g.layer("conv1")
    assert conv.opt("pad") == 2 and conv.opt("kernel_size") == 5
    assert conv.bottoms == ("data",)  # rewired past the padding layer
    assert conv.params[0].lr_mult == 1.0 and conv.params[1].lr_mult == 2.0
    prog = Program(g, train=False)
    data = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 10, 10, 3)), jnp.float32
    )
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    # pad 2 + k5 s1 keeps 10x10; pool 2/2 -> 5x5
    outs, _ = prog.apply(params, state, {"data": data}, capture=["pool1"])
    assert outs["pool1"].shape == (1, 5, 5, 4)
    np.testing.assert_allclose(float(jnp.sum(outs["prob"])), 1.0, rtol=1e-5)

    # unknown V0 field on the wrong type warns instead of failing
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        graph_from_prototxt("""
input: "x"  input_dim: 1 input_dim: 3 input_dim: 4 input_dim: 4
layers { layer { name: "r" type: "relu" dropout_ratio: 0.5 }
  bottom: "x" top: "y" }
""")
    assert any("dropout_ratio" in str(x.message) for x in w)
