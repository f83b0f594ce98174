"""int8 MXU measurement: raw matmul ratio + ECO-Lite int8-vs-bf16 serving.

    python -m eco_tpu.tools.int8_probe [-o out.json]

Companion to bench.py's ``bench_int8_infer`` stage: adds the raw
4096-matmul int8:bf16 MXU ratio so PERF_NOTES can separate the dtype
speedup (MXU-bound convs) from the Amdahl remainder (float pool/BN-fold/
softmax between the int8 layers).  K-vs-1 device-loop timing with scalar
host-fetch barriers (the relay-proof method, runtime/profiler.py).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _timed_chain(x, w, step, K=16, repeats=3):
    def run(k):
        @jax.jit
        def f():
            return lax.fori_loop(0, k, lambda i, a: step(a, w), x)

        float(jnp.sum(f().astype(jnp.float32)))  # compile + real barrier
        best = np.inf
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(jnp.sum(f().astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tK = run(1), run(K)
    return (tK - t1) / (K - 1)


def mxu_ratio(n: int = 4096) -> dict:
    rng = np.random.default_rng(0)
    out = {}
    xb = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    tb = _timed_chain(xb, wb, lambda a, w: lax.dot(a, w).astype(jnp.bfloat16))
    out["matmul_bf16_ms"] = round(tb * 1e3, 3)
    out["matmul_bf16_tops"] = round(2 * n**3 / tb / 1e12, 1)

    xi = jnp.asarray(rng.integers(-127, 128, (n, n)), jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 128, (n, n)), jnp.int8)

    def int8_step(a, w):
        y = lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        return (y >> 8).astype(jnp.int8)

    ti = _timed_chain(xi, wi, int8_step)
    out["matmul_int8_ms"] = round(ti * 1e3, 3)
    out["matmul_int8_tops"] = round(2 * n**3 / ti / 1e12, 1)
    out["int8_mxu_ratio"] = round(tb / ti, 2)
    return out


def conv_ratio(n: int = 1536, hw: int = 28, c: int = 96) -> dict:
    """int8:bf16 ratio on a serving-shape conv (the inception 3x3 trunk
    shape at b=96 x 16 segments: (1536, 28, 28, 96) -> 96 channels), the
    op class the quantized path actually accelerates."""
    rng = np.random.default_rng(1)
    out = {}
    dn = lax.conv_dimension_numbers(
        (n, hw, hw, c), (3, 3, c, c), ("NHWC", "HWIO", "NHWC")
    )

    xb = jnp.asarray(rng.standard_normal((n, hw, hw, c)), jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, jnp.bfloat16)

    def bf16_step(a, w):
        return lax.conv_general_dilated(
            a, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn
        ).astype(jnp.bfloat16)

    tb = _timed_chain(xb, wb, bf16_step, K=8)
    flops = 2 * n * hw * hw * 9 * c * c
    out["conv_bf16_ms"] = round(tb * 1e3, 3)
    out["conv_bf16_tops"] = round(flops / tb / 1e12, 1)

    xi = jnp.asarray(rng.integers(-127, 128, (n, hw, hw, c)), jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 128, (3, 3, c, c)), jnp.int8)

    def int8_step(a, w):
        y = lax.conv_general_dilated(
            a, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        return (y >> 10).astype(jnp.int8)

    ti = _timed_chain(xi, wi, int8_step, K=8)
    out["conv_int8_ms"] = round(ti * 1e3, 3)
    out["conv_int8_tops"] = round(flops / ti / 1e12, 1)
    out["int8_conv_ratio"] = round(tb / ti, 2)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--skip-e2e", action="store_true",
                    help="only the raw MXU ratio (fast)")
    args = ap.parse_args(argv)

    print("devices:", jax.devices(), flush=True)
    results = mxu_ratio()
    print(json.dumps(results), flush=True)
    results.update(conv_ratio())
    print(json.dumps(results), flush=True)

    if not args.skip_e2e:
        import bench  # repo-root bench.py

        r_bf16 = bench.bench_infer("eco_lite_kinetics", 96, with_cost=True)
        results["eco_lite_bf16_videos_per_sec"] = round(
            r_bf16["videos_per_sec"], 1
        )
        r_int8 = bench.bench_int8_infer()
        results.update(r_int8)
        results["int8_speedup_vs_bf16"] = round(
            r_int8["int8_videos_per_sec"] / r_bf16["videos_per_sec"], 2
        )
    print(json.dumps(results), flush=True)
    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f)


if __name__ == "__main__":
    main()
