"""TSN oversampled eval, dataset tooling, graph drawing."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from eco_tpu.apps.tsn_eval import OversampleEvaluator, oversample_video, ten_crop
from eco_tpu.data import VideoRecord
from eco_tpu.runtime import Program
from eco_tpu.spec.netspec import NetBuilder
from eco_tpu.tools.datasets import class_index, create_list
from eco_tpu.tools.draw import to_dot


def test_ten_crop():
    img = np.arange(256 * 340 * 3, dtype=np.float32).reshape(256, 340, 3)
    crops = ten_crop(img, 224)
    assert crops.shape == (10, 224, 224, 3)
    np.testing.assert_array_equal(crops[0], img[:224, :224])
    np.testing.assert_array_equal(crops[5], img[:224, :224][:, ::-1])
    np.testing.assert_array_equal(crops[4], img[16:240, 58:282])


@pytest.fixture()
def frame_dir(tmp_path):
    d = tmp_path / "cls_a" / "vid0"
    d.mkdir(parents=True)
    for f in range(30):
        cv2.imwrite(
            str(d / ("img_%04d.jpg" % (f + 1))),
            np.full((256, 340, 3), f * 3, np.uint8),
        )
    return tmp_path


def test_oversample_video(frame_dir):
    vdir = str(frame_dir / "cls_a" / "vid0")
    stacks = oversample_video(vdir, 30, num_frames=10, num_segments=4, crop=224)
    assert stacks.shape == (10, 4, 224, 224, 3)
    assert np.isfinite(stacks).all()


def test_oversample_evaluator(frame_dir):
    b = NetBuilder("m")
    x = b.input("data", (10, 4, 224, 224, 3))
    x = b.layer("fold", "fold_segments", x)
    x = b.conv("c", x, 4, k=3, s=4, p=1)
    x = b.layer("unfold", "unfold_segments", x, num_segments=4)
    x = b.layer("gap", "global_avg_pool", x)
    y = b.fc("fc", x, 3)
    b.layer("probs", "softmax", y)
    g = b.build()
    prog = Program(g, train=False)
    params, state = prog.init(
        jax.random.PRNGKey(0), {"data": jnp.zeros((10, 4, 224, 224, 3))}
    )
    ev = OversampleEvaluator(prog, params, state)
    vdir = str(frame_dir / "cls_a" / "vid0")
    pred = ev.predict_video(vdir, 30, num_frames=10, num_segments=4)
    assert pred.shape == (3,)
    acc = ev.evaluate(
        [VideoRecord(vdir, 30, int(np.argmax(pred)))],
        num_frames=10, num_segments=4,
    )
    assert acc == 1.0


def test_create_list_and_class_index(frame_dir):
    # second class with too few frames -> dropped
    small = frame_dir / "cls_b" / "vid1"
    small.mkdir(parents=True)
    for f in range(3):
        cv2.imwrite(str(small / ("img_%04d.jpg" % (f + 1))),
                    np.zeros((8, 8, 3), np.uint8))
    idx = class_index(["cls_a", "cls_b"])
    assert idx == {"cls_a": 0, "cls_b": 1}
    lines = create_list(str(frame_dir), idx, min_frames=5)
    assert len(lines) == 1
    path, n, label = lines[0].rsplit(" ", 2)
    assert n == "30" and label == "0"


def test_to_dot():
    from eco_tpu.models import build_eco_lite

    g = build_eco_lite(num_classes=10, num_segments=4)
    dot = to_dot(g)
    assert dot.startswith("digraph")
    assert '"layer_conv1_7x7_s2"' in dot and '"layer_res5b_2"' in dot
    assert "fold_segments" in dot
