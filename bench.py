"""Headline benchmark: ECO-Lite 16-segment inference throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "videos/s", "vs_baseline": N/230}

Baseline: the reference claims "up to 230 videos/s" end-to-end online video
understanding on a single GPU (reference README.md:22; BASELINE.md).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from eco_tpu.models import get_model
from eco_tpu.runtime import Program

BASELINE_VIDEOS_PER_SEC = 230.0


def bench(batch: int = 64, num_segments: int = 16, iters: int = 10, warmup: int = 2):
    from eco_tpu.convert import optimize_for_inference

    graph = get_model("eco_lite_kinetics", num_segments=num_segments, batch=batch)
    prog0 = Program(graph, train=False)
    data = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (batch, num_segments, 224, 224, 3), dtype=np.float32
        ),
        dtype=jnp.bfloat16,
    )
    params, state = prog0.init(jax.random.PRNGKey(0), {"data": data})
    graph, params, state = optimize_for_inference(graph, params, state)
    prog = Program(graph, train=False, compute_dtype=jnp.bfloat16)

    @jax.jit
    def fwd(params, state, data):
        outs, _ = prog.apply(params, state, {"data": data})
        return outs["probs"]

    # Pipelined timing: dispatch `iters` distinct batches, then fetch every
    # output.  Through the axon relay each host round-trip costs ~30 ms, so
    # serial fetch-per-iteration under-reports device throughput; pipelining
    # overlaps the round-trips with compute (serving shape).  Cross-checked
    # against a device-side lax.fori_loop measurement (54.9 ms/batch-64 ==
    # 1165 v/s, within 5% of this number).
    variants = [
        jax.block_until_ready(data + jnp.bfloat16(i * 1e-3)) for i in range(4)
    ]
    for v in variants[:warmup]:
        np.asarray(fwd(params, state, v))
    t0 = time.perf_counter()
    outs = [fwd(params, state, variants[i % len(variants)]) for i in range(iters)]
    for o in outs:
        np.asarray(o)
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


def main():
    import os

    # batch 96 is the measured sweet spot on v5e (1184 v/s vs 1151 @ 64,
    # 1161 @ 128); override with ECO_BENCH_BATCHES=a,b,...
    batches = tuple(
        int(b) for b in os.environ.get("ECO_BENCH_BATCHES", "96").split(",")
    )
    best = 0.0
    errors = []
    for batch in batches:
        try:
            v = bench(batch=batch)
        except Exception as e:  # try remaining batch sizes, but never
            import traceback     # mask total failure as a 0.0 score

            traceback.print_exc()
            errors.append(e)
            continue
        best = max(best, v)
    if best == 0.0 and errors:
        raise errors[0]
    print(
        json.dumps(
            {
                "metric": "eco_lite_16seg_inference_throughput",
                "value": round(best, 1),
                "unit": "videos/s",
                "vs_baseline": round(best / BASELINE_VIDEOS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
