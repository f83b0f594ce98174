"""Runnable end-to-end example: train ECO-Lite on a synthetic frame dataset.

Generates class-colored JPEG frame directories (the ``path n_frames label``
layout the reference uses, README.md:58-62), then trains with the Caffe-style
solver semantics and evaluates. Runs on TPU or CPU.

    python examples/train_synthetic.py [--native] [--iters 20]

The equivalent of the reference's
``examples/action_recognition/train_action_recognition_rgb.sh`` launch, with
the dataset fabricated so it works out of the box.
"""

import argparse
import os
import sys
import tempfile

import numpy as np

# allow running from a source checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root, num_videos=12, frames=24, classes=3):
    import cv2

    rng = np.random.default_rng(0)
    colors = [(30, 30, 200), (30, 200, 30), (200, 30, 30)]
    lines = []
    for v in range(num_videos):
        d = os.path.join(root, f"v{v:03d}")
        os.makedirs(d, exist_ok=True)
        color = colors[v % classes]
        for f in range(frames):
            img = np.full((256, 340, 3), color, np.uint8)
            img += rng.integers(0, 25, img.shape, dtype=np.uint8)
            cv2.imwrite(os.path.join(d, "img_%04d.jpg" % (f + 1)), img)
        lines.append(f"{d} {frames} {v % classes}")
    lst = os.path.join(root, "train.txt")
    with open(lst, "w") as f:
        f.write("\n".join(lines) + "\n")
    return lst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--segments", type=int, default=4)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--native", action="store_true",
                    help="use the C++ data plane (libecodata)")
    args = ap.parse_args()

    import jax

    from eco_tpu.data import TransformConfig, VideoDataConfig, VideoPipeline
    from eco_tpu.models import build_eco_lite
    from eco_tpu.runtime import Program
    from eco_tpu.train import SolverConfig
    from eco_tpu.train.loop import Trainer

    root = tempfile.mkdtemp(prefix="eco_example")
    lst = make_dataset(root)
    print(f"dataset: {lst}")

    cfg = VideoDataConfig(
        source=lst, batch_size=args.batch, num_segments=args.segments,
        shuffle=True, transform=TransformConfig(crop_size=224),
    )
    if args.native:
        from eco_tpu.data.native import NativeVideoPipeline as Pipeline
    else:
        Pipeline = VideoPipeline
    pipe = Pipeline(cfg, train=True, seed=0)

    graph = build_eco_lite(
        num_classes=3, num_segments=args.segments, with_loss=True,
        batch=args.batch,
    )
    train_prog = Program(graph, train=True)
    test_prog = Program(graph, train=False)
    scfg = SolverConfig(
        base_lr=0.005, lr_policy="fixed", momentum=0.9, weight_decay=5e-4,
        clip_gradients=40.0, iter_size=1, solver_type="nesterov",
        max_iter=args.iters, display=5, snapshot=0, average_loss=5,
    )
    trainer = Trainer(train_prog, scfg, test_program=test_prog)

    def batches():
        while True:
            b = pipe.next_batch()
            yield {"data": b["data"][None], "label": b["label"][None]}

    it = batches()
    first = next(it)
    ts = trainer.init_state({k: v[0] for k, v in first.items()})
    import itertools

    ts = trainer.solve(ts, itertools.chain([first], it))

    eval_pipe = Pipeline(cfg, train=False, seed=1)
    metrics = trainer.test(
        ts, (eval_pipe.next_batch() for _ in range(4))
    )
    pipe.close()
    eval_pipe.close()
    print(f"final: {metrics}")


if __name__ == "__main__":
    main()
