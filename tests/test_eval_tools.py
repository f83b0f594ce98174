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


@pytest.fixture()
def flow_dir(tmp_path):
    d = tmp_path / "flowvid"
    (d / "flow_x").mkdir(parents=True)
    (d / "flow_y").mkdir(parents=True)
    for f in range(20):
        cv2.imwrite(str(d / "flow_x" / ("flow_%05d.jpg" % (f + 1))),
                    np.full((64, 80), 100 + f, np.uint8))
        cv2.imwrite(str(d / "flow_y" / ("flow_%05d.jpg" % (f + 1))),
                    np.full((64, 80), 150 - f, np.uint8))
    return str(d)


def test_ten_crop_flow_negates_x_on_flip():
    from eco_tpu.apps.tsn_eval import ten_crop_flow

    stack = np.random.default_rng(0).integers(
        0, 255, (256, 340, 4)).astype(np.float32)
    crops = ten_crop_flow(stack, 224)
    assert crops.shape == (10, 224, 224, 4)
    # crop 0 (TL) vs crop 5 (TL mirrored): y channels mirror, x channels
    # mirror AND negate (255 - v) -- VideoTemporalPrediction.py flow_flip
    flipped = stack[:, ::-1]
    np.testing.assert_array_equal(
        crops[5][..., 1], flipped[:224, :224, 1])
    np.testing.assert_array_equal(
        crops[5][..., 0], 255.0 - flipped[:224, :224, 0])
    np.testing.assert_array_equal(
        crops[5][..., 2], 255.0 - flipped[:224, :224, 2])


def test_oversample_flow_video_and_flow_eval(flow_dir):
    from eco_tpu.apps.tsn_eval import oversample_flow_video

    S, crop, L = 4, 32, 2
    crops = oversample_flow_video(
        flow_dir, 20, num_samples=S, optical_flow_frames=L, crop=crop,
        resize_hw=(48, 56),
    )
    assert crops.shape == (10, S, crop, crop, 2 * L)
    assert np.isfinite(crops).all()

    # end-to-end: a flow-input ECO graph evaluates the flow protocol
    b = NetBuilder("flow_m")
    x = b.input("data", (10, S, crop, crop, 2 * L))
    x = b.layer("fold", "fold_segments", x)
    x = b.conv("c", x, 4, k=3, s=2, p=1)
    x = b.layer("unfold", "unfold_segments", x, num_segments=S)
    x = b.layer("gap", "global_avg_pool", x)
    y = b.fc("fc", x, 3)
    b.layer("probs", "softmax", y)
    g = b.build()
    prog = Program(g, train=False)
    params, state = prog.init(
        jax.random.PRNGKey(0), {"data": jnp.zeros((10, S, crop, crop, 2 * L))}
    )
    ev = OversampleEvaluator(prog, params, state)
    pred = ev.predict_flow_video(
        flow_dir, 20, num_samples=S, optical_flow_frames=L, crop=crop,
        resize_hw=(48, 56),
    )
    assert pred.shape == (3,)
    acc = ev.evaluate(
        [VideoRecord(flow_dir, 20, int(np.argmax(pred)))],
        modality="FLOW", num_samples=S, optical_flow_frames=L, crop=crop,
        resize_hw=(48, 56),
    )
    assert acc == 1.0


@pytest.mark.slow
def test_flow_training_end_to_end(tmp_path, flow_dir):
    """Flow modality through the full stack: VideoPipeline(FLOW) ->
    flow-channel ECO-Lite -> train steps reduce loss (VERDICT r1 #7)."""
    from eco_tpu.data import TransformConfig, VideoDataConfig, VideoPipeline
    from eco_tpu.models import build_eco_lite
    from eco_tpu.train.loop import Trainer
    from eco_tpu.train.solver import SolverConfig

    # two synthetic flow classes with distinct motion statistics
    rng = np.random.default_rng(0)
    lines = []
    for v in range(4):
        d = tmp_path / f"fv{v}"
        (d / "flow_x").mkdir(parents=True)
        (d / "flow_y").mkdir(parents=True)
        base = 60 if v % 2 == 0 else 190
        for f in range(12):
            x = (base + rng.integers(0, 20, (48, 56))).astype(np.uint8)
            y = (255 - base + rng.integers(0, 20, (48, 56))).astype(np.uint8)
            cv2.imwrite(str(d / "flow_x" / ("flow_%05d.jpg" % (f + 1))), x)
            cv2.imwrite(str(d / "flow_y" / ("flow_%05d.jpg" % (f + 1))), y)
        lines.append(f"{d} 12 {v % 2}")
    lst = tmp_path / "flow_list.txt"
    lst.write_text("\n".join(lines) + "\n")

    S, crop = 2, 32
    cfg = VideoDataConfig(
        source=str(lst), batch_size=4, num_segments=S, modality="FLOW",
        name_pattern="flow_%05d.jpg", shuffle=True,
        transform=TransformConfig(
            crop_size=crop, is_flow=True, mirror=True,
            mean_values=(128.0, 128.0), multi_scale=False, fix_crop=False,
        ),
    )
    pipe = VideoPipeline(cfg, train=True, seed=0, num_workers=2)
    try:
        g = build_eco_lite(num_classes=2, num_segments=S, crop_size=crop,
                           in_channels=2, with_loss=True, batch=4)
        prog = Program(g, train=True)
        scfg = SolverConfig(
            base_lr=0.02, lr_policy="fixed", momentum=0.9, iter_size=1,
            solver_type="sgd", max_iter=8, display=0, snapshot=0,
            weight_decay=0.0,
        )
        trainer = Trainer(prog, scfg)

        def batches():
            while True:
                b = pipe.next_batch()
                yield {"data": b["data"][None], "label": b["label"][None]}

        it = batches()
        first = next(it)
        ts = trainer.init_state({k: v[0] for k, v in first.items()})
        import itertools

        losses = []
        ts = trainer.solve(
            ts, itertools.chain([first], it),
            hooks=[lambda i, t, m: losses.append(float(m["loss"]))],
        )
        assert np.isfinite(losses).all()
        assert np.mean(losses[-2:]) < np.mean(losses[:2])
    finally:
        pipe.close()


def test_oversample_reference_frame_rule(frame_dir):
    """Frame selection must pin the exact files the reference protocol reads:
    file i*step+1 with step = floor((duration-1)/(num_samples-1))
    (VideoSpatialPrediction.py:32-38).  The fixture's frame f has constant
    pixel value f*3, so the read index is recoverable from the pixels."""
    from eco_tpu.apps.tsn_eval import BGR_MEAN

    vdir = str(frame_dir / "cls_a" / "vid0")
    # duration=30, num_frames=10 -> step = floor(29/9) = 3 -> 0-based 0,3,..,27
    stacks = oversample_video(vdir, 30, num_frames=10, num_segments=10)
    got = [int(round((stacks[0, s, 0, 0, 0] + BGR_MEAN[0]) / 3)) for s in range(10)]
    assert got == [0, 3, 6, 9, 12, 15, 18, 21, 24, 27]
    # linspace opt-in reaches the video tail instead
    stacks = oversample_video(vdir, 30, num_frames=10, num_segments=10,
                              frame_rule="linspace")
    got = [int(round((stacks[0, s, 0, 0, 0] + BGR_MEAN[0]) / 3)) for s in range(10)]
    assert got[-1] == 29
    # short video (duration < num_frames): step=0 -> the reference re-reads
    # frame 1 for every sample; preserve that quirk bit-for-bit
    stacks = oversample_video(vdir, 8, num_frames=10, num_segments=4)
    got = [int(round((stacks[0, s, 0, 0, 0] + BGR_MEAN[0]) / 3)) for s in range(4)]
    assert got == [0, 0, 0, 0]
