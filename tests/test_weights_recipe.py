"""The real-weights parity recipe, rehearsed end-to-end (VERDICT r1 #9).

The released ECO caffemodels (reference download_models.sh:1-21) cannot be
fetched in this environment, so this test pins the EXACT command pair a user
runs the moment they are mountable -- ``eco convert`` then ``eco test`` --
against the checked-in mini fixture (tests/fixtures/mini_eco.caffemodel,
handcrafted weights that classify solid-color videos perfectly).  The
tolerance gate (top1 == 1.0 here; docs/REAL_WEIGHTS.md for the released
models) fails on any regression in the wire reader, layout conversion, BN
import, or the eval path.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from eco_tpu.tools.cli import main

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURE_NET = os.path.join(HERE, "fixtures", "mini_eco.prototxt")
FIXTURE_MODEL = os.path.join(HERE, "fixtures", "mini_eco.caffemodel")


@pytest.fixture(scope="module")
def color_dataset(tmp_path_factory):
    """Solid-color videos; label = dominant BGR channel index."""
    root = tmp_path_factory.mktemp("colors")
    rng = np.random.default_rng(0)
    lines = []
    for v in range(6):
        cls = v % 3
        color = [30, 30, 30]
        color[cls] = 200
        d = root / f"v{v}"
        d.mkdir()
        for f in range(8):
            img = np.full((64, 80, 3), color, np.uint8)
            img = np.clip(
                img.astype(np.int32) + rng.integers(-10, 10, img.shape), 0, 255
            ).astype(np.uint8)
            cv2.imwrite(str(d / ("img_%04d.jpg" % (f + 1))), img)
        lines.append(f"{d} 8 {cls}")
    lst = root / "list.txt"
    lst.write_text("\n".join(lines) + "\n")
    return str(lst)


def test_convert_then_test_recipe(color_dataset, tmp_path, capsys):
    npz = str(tmp_path / "mini_eco.model.npz")
    # step 1: convert the caffemodel against the unmodified prototxt
    main(["convert", "--caffemodel", FIXTURE_MODEL, "--net", FIXTURE_NET,
          "-o", npz])
    out = capsys.readouterr().out
    assert "Converted 3 layers" in out
    # step 2: evaluate with in-graph accuracy over the video list
    means = main(["test", "--net", FIXTURE_NET, "--weights", npz,
                  "--list", color_dataset, "--iterations", "4"])
    assert means["top1"] == 1.0, means
    assert np.isfinite(means["loss"])


def test_export_import_roundtrip(tmp_path):
    """export_caffe_weights is the exact inverse of import_caffe_weights."""
    import jax
    import jax.numpy as jnp

    from eco_tpu.convert import export_caffe_weights, import_caffe_weights
    from eco_tpu.runtime import Program
    from eco_tpu.spec.prototxt import graph_from_prototxt

    g = graph_from_prototxt(open(FIXTURE_NET).read())
    prog = Program(g, train=False)
    rng = np.random.default_rng(1)
    data = jnp.asarray(rng.standard_normal((1, 2, 32, 32, 3)), jnp.float32)
    label = jnp.zeros((1,), jnp.int32)
    params, state = prog.init(jax.random.PRNGKey(3),
                              {"data": data, "label": label})
    # randomize BN state so the roundtrip is non-trivial
    state["conv1_bn"]["mean"] = jnp.asarray(rng.standard_normal(3), jnp.float32)
    state["conv1_bn"]["var"] = jnp.asarray(rng.random(3) + 0.5, jnp.float32)

    path = str(tmp_path / "rt.caffemodel")
    exported = export_caffe_weights(g, params, state, path)
    assert set(exported) == {"conv1", "conv1_bn", "fc"}

    # import into zeroed trees and compare
    zp = {k: {p: jnp.zeros_like(v) for p, v in lp.items()}
          for k, lp in params.items()}
    zs = {k: {p: jnp.zeros_like(v) for p, v in ls.items()}
          for k, ls in state.items()}
    ip, is_, report = import_caffe_weights(g, zp, zs, path)
    assert sorted(report["loaded"]) == ["conv1", "conv1_bn", "fc"]
    for lname, lp in params.items():
        for pname, v in lp.items():
            np.testing.assert_allclose(
                np.asarray(ip[lname][pname]), np.asarray(v), rtol=1e-6,
                err_msg=f"{lname}/{pname}",
            )
    for lname, ls in state.items():
        for pname, v in ls.items():
            np.testing.assert_allclose(
                np.asarray(is_[lname][pname]), np.asarray(v), rtol=1e-6,
                err_msg=f"{lname}/{pname}",
            )


@pytest.mark.slow
def test_export_eco_lite_roundtrips_through_caffe_wire(tmp_path):
    """Full ECO-Lite: our params -> .caffemodel -> import -> identical
    outputs (covers 3D conv and 5D BN blob layouts both ways)."""
    import jax
    import jax.numpy as jnp

    from eco_tpu.convert import export_caffe_weights, import_caffe_weights
    from eco_tpu.models import build_eco_lite
    from eco_tpu.runtime import Program

    g = build_eco_lite(num_classes=5, num_segments=4, crop_size=64, batch=1)
    prog = Program(g, train=False)
    data = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 4, 64, 64, 3)),
        jnp.float32,
    )
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    path = str(tmp_path / "lite.caffemodel")
    export_caffe_weights(g, params, state, path)
    p2, s2, report = import_caffe_weights(
        g,
        {k: {p: jnp.zeros_like(v) for p, v in lp.items()}
         for k, lp in params.items()},
        {k: {p: jnp.zeros_like(v) for p, v in ls.items()}
         for k, ls in state.items()},
        path,
    )
    assert not report["skipped"]
    ref = prog.apply(params, state, {"data": data})[0]["probs"]
    got = prog.apply(p2, s2, {"data": data})[0]["probs"]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-7
    )


def test_cli_export_subcommand(tmp_path, capsys):
    import jax
    import jax.numpy as jnp

    from eco_tpu.runtime import Program
    from eco_tpu.spec.prototxt import graph_from_prototxt
    from eco_tpu.train import save_model

    g = graph_from_prototxt(open(FIXTURE_NET).read())
    prog = Program(g, train=False)
    data = jnp.zeros((1, 2, 32, 32, 3), jnp.float32)
    params, state = prog.init(jax.random.PRNGKey(0),
                              {"data": data, "label": jnp.zeros((1,), jnp.int32)})
    npz = str(tmp_path / "m.model.npz")
    save_model(npz, params, state)
    out = str(tmp_path / "m.caffemodel")
    main(["export", "--net", FIXTURE_NET, "--weights", npz, "-o", out])
    assert "Exported 3 layers" in capsys.readouterr().out
    from eco_tpu.convert import load_caffemodel

    layers = load_caffemodel(out)
    assert set(layers) == {"conv1", "conv1_bn", "fc"}


FIXTURE_MODEL_ISTD = os.path.join(HERE, "fixtures", "mini_eco_invstd.caffemodel")
FLOW_NET = os.path.join(HERE, "fixtures", "mini_flow.prototxt")
FLOW_MODEL = os.path.join(HERE, "fixtures", "mini_flow.caffemodel")


def test_parity_cli_one_command(color_dataset, tmp_path, capsys):
    """`eco parity`: the whole REAL_WEIGHTS.md gate pipeline in one command
    with one JSON verdict (VERDICT r2 #7)."""
    import json

    out = str(tmp_path / "verdict.json")
    verdict = main([
        "parity", "--caffemodel", FIXTURE_MODEL, "--net", FIXTURE_NET,
        "--list", color_dataset, "--iterations", "4",
        "--expect-top1", "1.0", "-o", out,
    ])
    assert verdict["pass"] is True
    g = verdict["gates"]
    assert g["coverage"]["pass"] and g["coverage"]["loaded"] == 3
    assert g["bn_fold_consistency"]["pass"]
    assert g["dataset_eval"]["pass"]
    assert g["dataset_eval"]["metrics"]["top1"] == 1.0
    # dumped logits let the Caffe side diff the same seeded input later
    assert os.path.exists(g["fixed_input_logits"]["dumped"])
    # the verdict file holds the same JSON line
    with open(out) as f:
        assert json.load(f)["pass"] is True
    # and a ref-logits round-trip closes the loop: our own dump must pass
    verdict2 = main([
        "parity", "--caffemodel", FIXTURE_MODEL, "--net", FIXTURE_NET,
        "--ref-logits", g["fixed_input_logits"]["dumped"],
    ])
    assert verdict2["gates"]["fixed_input_logits"]["pass"]
    assert verdict2["gates"]["fixed_input_logits"]["max_abs_diff"] == 0.0


def test_parity_cli_int8_gate(color_dataset, tmp_path):
    """`eco parity --int8`: PTQ gates on the same one-command pipeline --
    fixed-input argmax agreement + quantized dataset eval top-1 drop."""
    verdict = main([
        "parity", "--caffemodel", FIXTURE_MODEL, "--net", FIXTURE_NET,
        "--list", color_dataset, "--iterations", "4", "--int8",
    ])
    assert verdict["pass"] is True
    g = verdict["gates"]
    assert g["int8_quantization"]["pass"]
    assert g["int8_quantization"]["layers"] >= 1
    assert g["int8_quantization"]["argmax_agreement"] == 1.0
    assert g["int8_dataset_eval"]["pass"]
    assert g["int8_dataset_eval"]["top1_drop"] <= 0.02


def test_parity_cli_fails_on_wrong_weights(color_dataset, tmp_path):
    """A caffemodel that does not cover the net must FAIL the coverage gate
    (non-zero exit), not silently pass."""
    import pytest as _pytest

    from eco_tpu.convert import load_caffemodel
    from eco_tpu.convert.write import export_caffe_weights
    from eco_tpu.spec.prototxt import graph_from_prototxt

    # a partial checkpoint: only conv1, no BN / fc
    g = graph_from_prototxt(open(FIXTURE_NET).read())
    full = load_caffemodel(FIXTURE_MODEL)
    w = np.transpose(full["conv1"]["blobs"][0], (2, 3, 1, 0))
    partial = str(tmp_path / "partial.caffemodel")
    export_caffe_weights(
        g, {"conv1": {"w": w, "b": full["conv1"]["blobs"][1]}}, {}, partial
    )
    with _pytest.raises(SystemExit) as ei:
        main(["parity", "--caffemodel", partial, "--net", FIXTURE_NET])
    assert ei.value.code == 2


def test_convert_inv_std_bn_style(color_dataset, tmp_path):
    """bn_convert_style.py parity: an inverse-std checkpoint imported with
    --bn-style inv_std must reproduce the var-style model exactly."""
    from eco_tpu.train import load_model

    a = str(tmp_path / "var.model.npz")
    b = str(tmp_path / "istd.model.npz")
    main(["convert", "--caffemodel", FIXTURE_MODEL, "--net", FIXTURE_NET,
          "-o", a])
    main(["convert", "--caffemodel", FIXTURE_MODEL_ISTD, "--net", FIXTURE_NET,
          "--bn-style", "inv_std", "-o", b])
    pa, sa = load_model(a)
    pb, sb = load_model(b)
    np.testing.assert_allclose(
        np.asarray(sa["conv1_bn"]["var"]), np.asarray(sb["conv1_bn"]["var"]),
        rtol=1e-5,
    )
    # and the istd model aces the eval like the var one
    means = main(["test", "--net", FIXTURE_NET, "--weights", b,
                  "--list", color_dataset, "--iterations", "4"])
    assert means["top1"] == 1.0, means


@pytest.fixture()
def flow_dataset(tmp_path):
    """Flow videos: label 1 iff flow_x is brighter than the 128 mean."""
    rng = np.random.default_rng(0)
    lines = []
    for v in range(4):
        label = v % 2
        base = 190 if label else 60
        d = tmp_path / f"fv{v}"
        (d / "flow_x").mkdir(parents=True)
        (d / "flow_y").mkdir(parents=True)
        for f in range(10):
            x = np.clip(base + rng.integers(-15, 15, (48, 56)), 0, 255)
            y = np.clip(128 + rng.integers(-15, 15, (48, 56)), 0, 255)
            cv2.imwrite(str(d / "flow_x" / ("flow_%05d.jpg" % (f + 1))),
                        x.astype(np.uint8))
            cv2.imwrite(str(d / "flow_y" / ("flow_%05d.jpg" % (f + 1))),
                        y.astype(np.uint8))
        lines.append(f"{d} 10 {label}")
    lst = tmp_path / "flow.txt"
    lst.write_text("\n".join(lines) + "\n")
    return str(lst)


def test_flow_net_convert_and_eval(flow_dataset, tmp_path, capsys):
    """The recipe also rehearses a FLOW-modality net: convert the flow
    caffemodel, evaluate on synthetic flow frames, expect 100% top-1."""
    npz = str(tmp_path / "mini_flow.model.npz")
    main(["convert", "--caffemodel", FLOW_MODEL, "--net", FLOW_NET,
          "-o", npz])
    assert "Converted 2 layers" in capsys.readouterr().out
    means = main(["test", "--net", FLOW_NET, "--weights", npz,
                  "--list", flow_dataset, "--iterations", "4"])
    assert means["top1"] == 1.0, means


@pytest.mark.slow
def test_eco_full_caffemodel_roundtrip(tmp_path):
    """ECO-Full-shaped rehearsal: random weights for the REAL reference
    ECO-Full deploy prototxt (shared 3c tower, 2D branch, 5D BN blobs)
    export to .caffemodel, re-import, and produce identical logits."""
    import jax
    import jax.numpy as jnp

    from eco_tpu.convert import export_caffe_weights, import_caffe_weights
    from eco_tpu.runtime import Program
    from eco_tpu.spec.prototxt import graph_from_prototxt

    ref = "/root/reference/models_ECO_Full/kinetics/deploy.prototxt"
    if not os.path.exists(ref):
        pytest.skip("reference checkout not mounted")
    text = open(ref).read()
    # shrink to rehearsal scale: 4 segments instead of 16 (the documented
    # num_segments retarget, README.md:85-95) by editing the declared dims
    text = text.replace("input_dim: 80", "input_dim: 4", 1)
    g = graph_from_prototxt(text)
    # retarget every segment-dependent option from 16 to 4
    from eco_tpu.spec.graph import GraphSpec, LayerSpec

    new_layers = []
    for l in g.layers:
        if l.type == "unfold_segments":
            l = l.replace(options={**l.options, "num_segments": 4})
        if l.type == "segment_consensus":
            l = l.replace(options={**l.options, "num_segments": 4})
        if l.type == "pooling" and l.opt("kernel_size") == [4, 7, 7]:
            l = l.replace(options={**l.options, "kernel_size": [1, 7, 7]})
        new_layers.append(l)
    g.layers = new_layers

    prog = Program(g, train=False)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((4, 224, 224, 3)) * 3, jnp.float32)
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    path = str(tmp_path / "eco_full.caffemodel")
    exported = export_caffe_weights(g, params, state, path)
    assert len(exported) > 150  # 82 conv + 80 bn + fc territory

    zp = {k: {p: jnp.zeros_like(v) for p, v in lp.items()}
          for k, lp in params.items()}
    zs = {k: {p: jnp.zeros_like(v) for p, v in ls.items()}
          for k, ls in state.items()}
    ip, is_, report = import_caffe_weights(g, zp, zs, path)
    assert not report["skipped"]
    out_ref, _ = prog.apply(params, state, {"data": data})
    out_got, _ = prog.apply(ip, is_, {"data": data})
    np.testing.assert_allclose(
        np.asarray(out_got[prog.output_names[-1]]),
        np.asarray(out_ref[prog.output_names[-1]]), rtol=1e-5, atol=1e-6,
    )
