"""Profiling & observability -- ``caffe time`` + ``debug_info`` parity.

- :func:`time_layers`: per-layer forward micro-benchmark (tools/caffe.cpp
  time(), :276-360).  Each layer is jitted and timed in isolation on its real
  intermediate inputs; note that in the fused whole-graph program XLA melts
  layer boundaries, so the sum of per-layer times is an upper bound.
- :func:`debug_info`: per-blob L1-mean of activations (Net::ForwardDebugInfo,
  net.cpp:708-783) for numeric debugging.
- :func:`memory_analysis`: compiled-HLO memory footprint (the TPU-side view
  the reference approximates with cudaMemGetInfo, solver.cpp:268-290).
- :func:`trace`: context manager around the JAX profiler (tensorboard trace).
"""

from __future__ import annotations

import contextlib
import time
from typing import Mapping

import numpy as np
import jax

from eco_tpu.runtime.executor import Context, get_impl


def _run_collect(program, params, state, inputs, *, rng=None):
    """Eager forward capturing every blob value."""
    if rng is None and program.train:
        rng = jax.random.PRNGKey(0)  # dropout etc. need a key in train mode
    ctx = Context(train=program.train, rng=rng, compute_dtype=program.compute_dtype)
    blobs = dict(inputs)
    for k, v in list(blobs.items()):
        import jax.numpy as jnp

        v = jnp.asarray(v)
        if (
            program.compute_dtype is not None
            and jnp.issubdtype(v.dtype, jnp.floating)
            and v.ndim >= 3
        ):
            v = v.astype(program.compute_dtype)
        blobs[k] = v
    for layer in program.exec_layers:
        impl = get_impl(layer.type)
        ins = [blobs[b] for b in layer.bottoms]
        outs, _ = impl.apply(
            layer, params.get(layer.name, {}), state.get(layer.name, {}), ins, ctx
        )
        for t, o in zip(layer.tops, outs):
            blobs[t] = o
    return blobs


def time_layers(
    program,
    params,
    state,
    inputs: Mapping,
    *,
    iters: int = 10,
    warmup: int = 2,
    rng=None,
    backward: bool = False,
):
    """Per-layer micro-benchmark.

    Returns [(layer_name, type, fwd_ms)] or, with ``backward=True``,
    [(layer_name, type, fwd_ms, bwd_ms)] where bwd is the layer's VJP on its
    inputs+params (what ``caffe time`` reports per layer,
    tools/caffe.cpp:318-357).
    """
    if rng is None and program.train:
        rng = jax.random.PRNGKey(0)
    blobs = _run_collect(program, params, state, inputs, rng=rng)
    ctx = Context(train=program.train, rng=rng, compute_dtype=program.compute_dtype)
    rows = []

    def bench(fn, args):
        for _ in range(warmup):
            out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    for layer in program.exec_layers:
        impl = get_impl(layer.type)
        ins = [blobs[b] for b in layer.bottoms]
        lp = params.get(layer.name, {})
        ls = state.get(layer.name, {})

        def fwd(lp, *xs, impl=impl, layer=layer, ls=ls):
            return impl.apply(layer, lp, ls, list(xs), ctx)[0]

        fwd_ms = bench(jax.jit(fwd), (lp, *ins))
        if backward:
            import jax.numpy as jnp

            def loss(lp, *xs, fwd=fwd):
                outs = fwd(lp, *xs)
                return sum(
                    jnp.sum(o.astype(jnp.float32))
                    for o in outs
                    if hasattr(o, "dtype")
                )

            grad_fn = jax.jit(jax.grad(loss, argnums=tuple(range(1 + len(ins)))))
            try:
                bwd_ms = bench(grad_fn, (lp, *ins)) - fwd_ms
            except TypeError:
                bwd_ms = float("nan")  # non-differentiable (int inputs etc.)
            rows.append((layer.name, layer.type, fwd_ms, max(bwd_ms, 0.0)))
        else:
            rows.append((layer.name, layer.type, fwd_ms))
    return rows


def format_layer_times(rows) -> str:
    has_bwd = rows and len(rows[0]) == 4
    hdr = f"{'layer':40s} {'type':18s} {'fwd ms':>9s}"
    if has_bwd:
        hdr += f" {'bwd ms':>9s}"
    lines = [hdr]
    for row in rows:
        line = f"{row[0]:40s} {row[1]:18s} {row[2]:9.3f}"
        if has_bwd:
            line += f" {row[3]:9.3f}"
        lines.append(line)
    total = sum(r[2] for r in rows)
    lines.append(f"{'TOTAL (sum of isolated layers)':59s} {total:9.3f}")
    return "\n".join(lines)


def debug_info(program, params, state, inputs, *, rng=None):
    """[(blob, shape, L1-mean)] for every activation (net.cpp debug_info)."""
    blobs = _run_collect(program, params, state, inputs, rng=rng)
    rows = []
    for name, v in blobs.items():
        arr = np.asarray(v, np.float32)
        rows.append((name, tuple(arr.shape), float(np.abs(arr).mean())))
    return rows


def memory_analysis(jitted_fn, *args):
    """Compiled memory stats dict for a jitted function on example args."""
    compiled = jitted_fn.lower(*args).compile()
    ma = compiled.memory_analysis()
    if ma is None:
        return {}
    keys = (
        "argument_size_in_bytes",
        "output_size_in_bytes",
        "temp_size_in_bytes",
        "generated_code_size_in_bytes",
    )
    return {k: getattr(ma, k, None) for k in keys}


@contextlib.contextmanager
def trace(logdir: str):
    """JAX profiler trace (view with tensorboard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
