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
