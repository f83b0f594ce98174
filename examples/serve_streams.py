"""Runnable online-serving example: N concurrent streams, one chip.

The reference's headline scenario ("online video understanding ... up to
230 videos/s", reference README.md:22, driven one-window-at-a-time by
scripts/online_recognition/online_recognition.py). Here the same
sliding-window + sampling-memory + running-mean-logits semantics run
BATCHED: every stream ticks together and one fixed-shape forward scores
all ready windows, so the online path keeps the MXU on the same
throughput shape as offline batch inference.

    python examples/serve_streams.py [--streams 16] [--segments 8] \
        [--ticks 3] [--workers 0]

Works on TPU or CPU (small defaults; raise --streams/--segments on a real
chip). Frames are synthetic 256x340 BGR "camera" output.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=16)
    ap.add_argument("--segments", type=int, default=8)
    ap.add_argument("--ticks", type=int, default=3,
                    help="window predictions per stream after warmup")
    ap.add_argument("--workers", type=int, default=0,
                    help="host preprocessing threads (0 = inline)")
    args = ap.parse_args()
    if args.streams < 1 or args.segments < 1 or args.ticks < 1:
        ap.error("--streams/--segments/--ticks must all be >= 1")

    import jax
    import jax.numpy as jnp

    from eco_tpu.apps.online import MultiStreamRecognizer
    from eco_tpu.convert import optimize_for_inference
    from eco_tpu.models import get_model
    from eco_tpu.runtime import Program

    print(f"backend: {jax.devices()[0].platform}", flush=True)
    graph = get_model(
        "eco_lite_kinetics", num_segments=args.segments, batch=args.streams
    )
    prog = Program(graph, train=False)
    zero = jnp.zeros(
        (args.streams, args.segments, 224, 224, 3), jnp.float32
    )
    params, state = prog.init(jax.random.PRNGKey(0), {"data": zero})
    # BN folding + sibling-1x1 merge: the inference-form graph
    graph, params, state = optimize_for_inference(graph, params, state)
    prog = Program(graph, train=False, compute_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    cameras = [
        rng.integers(0, 255, (256, 340, 3), np.uint8)
        for _ in range(args.streams)
    ]

    with MultiStreamRecognizer(
        prog, params, state, num_streams=args.streams,
        num_segments=args.segments, num_workers=args.workers,
    ) as rec:
        def tick():
            """Feed one full window per stream; every stream predicts."""
            for _ in range(args.segments):
                res = rec.push_frames(cameras)
            return res

        res = tick()  # fills windows + compiles the batched forward
        t0 = time.perf_counter()
        for _ in range(args.ticks):
            res = tick()
        dt = (time.perf_counter() - t0) / args.ticks
        for i, r in enumerate(res[:4]):
            label, smoothed = r
            print(f"stream {i}: class {label} "
                  f"(smoothed logit {smoothed[label]:.3f})")
        print(f"{args.streams} streams -> "
              f"{args.streams / dt:.1f} window predictions/s "
              f"(full loop incl. host preprocessing)")


if __name__ == "__main__":
    main()
