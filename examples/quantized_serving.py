"""Runnable int8-serving example: quantize ECO-Lite and compare predictions.

Post-training quantization on a synthetic calibration batch, then a
side-by-side forward of the bf16 and int8 graphs: prints the per-layer
quantization report, the prediction agreement, and (on a real chip) the
throughput of both paths.

    python examples/quantized_serving.py [--segments 8] [--batch 8] \
        [--crop 128] [--iters 5]

Works on TPU or CPU (small defaults; use --crop 224 --batch 96 on a chip).
No reference counterpart: Caffe serves f32 (see PARITY.md).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--crop", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from eco_tpu.convert import quantize_for_serving
    from eco_tpu.models import get_model
    from eco_tpu.runtime import Program

    graph = get_model(
        "eco_lite_ucf101", num_segments=args.segments, batch=args.batch,
        crop_size=args.crop,
    )
    prog = Program(graph, train=False, compute_dtype=jnp.bfloat16)
    data = jax.random.normal(
        jax.random.PRNGKey(7),
        (args.batch, args.segments, args.crop, args.crop, 3),
        dtype=jnp.bfloat16,
    ) * 60.0
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})

    t0 = time.perf_counter()
    qprog, qp, qs, report = quantize_for_serving(
        prog, params, state, [{"data": data}], compute_dtype=jnp.bfloat16
    )
    print(f"quantized {len(report['quantized'])} conv/fc layers "
          f"in {time.perf_counter() - t0:.1f}s")

    @jax.jit
    def fwd_f(p, s, d):
        return prog.apply(p, s, {"data": d})[0]["probs"]

    @jax.jit
    def fwd_q(p, s, d):
        return qprog.apply(p, s, {"data": d})[0]["probs"]

    ref = np.asarray(fwd_f(params, state, data), np.float32)
    out = np.asarray(fwd_q(qp, qs, data), np.float32)
    agree = float((ref.argmax(-1) == out.argmax(-1)).mean())
    print(f"argmax agreement: {agree:.3f}   "
          f"max |prob diff|: {np.abs(ref - out).max():.4f}")

    for name, fn, p, s in (("bf16", fwd_f, params, state),
                           ("int8", fwd_q, qp, qs)):
        float(jnp.sum(fn(p, s, data)))  # warmup + real barrier
        t0 = time.perf_counter()
        for _ in range(args.iters):
            float(jnp.sum(fn(p, s, data)))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name}: {args.batch / dt:8.1f} videos/s  ({dt * 1e3:.2f} ms)")


if __name__ == "__main__":
    main()
