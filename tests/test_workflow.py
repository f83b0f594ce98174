"""End-to-end workflow test: the reference's full training recipe.

Mirrors run.sh + solver.prototxt semantics (models_ECO_Lite/*/run.sh):
initialize ECO from TWO partial pretrained artifacts (2D trunk + 3D head,
comma-separated --weights), fine-tune with Nesterov/iter_size/clip, snapshot,
resume, and evaluate with in-graph accuracy -- all on a synthetic dataset the
model can learn.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from eco_tpu.data import TransformConfig, VideoDataConfig, VideoPipeline
from eco_tpu.models import build_eco_lite
from eco_tpu.runtime import Program
from eco_tpu.train import (
    SolverConfig,
    init_train_state,
    restore_weights,
    save_model,
)
from eco_tpu.train.loop import Trainer

pytestmark = pytest.mark.slow  # compile-heavy: full-model builds


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    lines = []
    colors = [(30, 30, 200), (30, 200, 30), (200, 30, 30)]
    for v in range(9):
        d = root / f"v{v}"
        d.mkdir()
        for f in range(20):
            img = np.full((80, 100, 3), colors[v % 3], np.uint8)
            img = img + rng.integers(0, 25, img.shape).astype(np.uint8)
            cv2.imwrite(str(d / ("img_%04d.jpg" % (f + 1))), img)
        lines.append(f"{d} 20 {v % 3}")
    lst = root / "list.txt"
    lst.write_text("\n".join(lines) + "\n")
    return str(lst)


def test_full_training_workflow(dataset, tmp_path):
    S, crop, classes = 4, 64, 3
    g = build_eco_lite(num_classes=classes, num_segments=S, crop_size=crop,
                       fc_name="fc8", with_loss=True, batch=3)
    train_prog = Program(g, train=True)
    test_prog = Program(g, train=False)

    cfg = SolverConfig(
        base_lr=0.003, lr_policy="step", gamma=0.1, stepsize=40,
        momentum=0.9, weight_decay=5e-4, clip_gradients=40.0,
        iter_size=2, solver_type="nesterov", max_iter=12,
        display=4, average_loss=4, snapshot=6,
        snapshot_prefix=str(tmp_path / "snap"),
    )
    dcfg = VideoDataConfig(
        source=dataset, batch_size=3, num_segments=S, shuffle=True,
        transform=TransformConfig(crop_size=crop, mean_values=(104, 117, 123)),
    )
    pipe = VideoPipeline(dcfg, train=True, seed=0, num_workers=2)

    def micro_iter():
        while True:
            ms = [pipe.next_batch() for _ in range(cfg.iter_size)]
            yield {
                "data": np.stack([m["data"] for m in ms]),
                "label": np.stack([m["label"] for m in ms]),
            }

    it = micro_iter()
    first = next(it)
    trainer = Trainer(train_prog, cfg, test_program=test_prog)
    ts = trainer.init_state({k: v[0] for k, v in first.items()})

    # ---- multi-artifact transfer init (2D trunk + 3D head separately) ----
    trunk_layers = {k: v for k, v in ts.params.items() if "inception" in k or "conv" in k}
    trunk_state = {k: v for k, v in ts.state.items() if "inception" in k or "conv" in k}
    head_layers = {k: v for k, v in ts.params.items() if k.startswith("res")}
    head_state = {k: v for k, v in ts.state.items() if k.startswith("res")}
    p2d = str(tmp_path / "trunk.model.npz")
    p3d = str(tmp_path / "head.model.npz")
    save_model(p2d, trunk_layers, trunk_state)
    save_model(p3d, head_layers, head_state)
    params, state, loaded = restore_weights(f"{p2d},{p3d}", ts.params, ts.state)
    assert any("inception" in l for l in loaded) and any(
        l.startswith("res") for l in loaded
    )
    import dataclasses

    ts = dataclasses.replace(ts, params=params, state=state)

    # ---- train + snapshot ----
    import itertools

    logs = []
    trainer.log = logs.append
    ts = trainer.solve(ts, itertools.chain([first], it))
    assert int(ts.it) == cfg.max_iter
    state_path = str(tmp_path / "snap") + "_iter_6.solverstate.npz"
    assert os.path.exists(state_path)

    # ---- resume from iter 6 and train to completion again ----
    ts2 = trainer.init_state({k: v[0] for k, v in first.items()}, seed=9)
    ts2 = trainer.solve(ts2, micro_iter(), resume_from=state_path)
    assert int(ts2.it) == cfg.max_iter

    # ---- evaluate: model must beat chance comfortably on train dist ----
    eval_pipe = VideoPipeline(dcfg, train=False, seed=1, num_workers=2)
    batches = (eval_pipe.next_batch() for _ in range(6))
    metrics = trainer.test(ts, batches)
    pipe.close()
    eval_pipe.close()
    assert metrics["top1"] > 0.5, metrics
