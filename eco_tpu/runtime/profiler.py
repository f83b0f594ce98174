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
    blobs = {k: program.cast_input(v) for k, v in inputs.items()}
    for layer in program.exec_layers:
        impl = get_impl(layer.type)
        ins = [blobs[b] for b in layer.bottoms]
        outs, _ = impl.apply(
            layer, params.get(layer.name, {}), state.get(layer.name, {}), ins, ctx
        )
        for t, o in zip(layer.tops, outs):
            blobs[t] = o
    return blobs


def _make_timing_loop(fn, treedef, f_idxs):
    """Build the jitted K-iteration timing loop for :func:`_device_loop_ms`.

    ``run(n, *leaves)`` executes ``fn`` n times in an on-device
    ``lax.fori_loop``.  EVERY float leaf (``f_idxs``) is perturbed by the
    loop carry so that no operand of ``fn`` is loop-invariant -- otherwise
    XLA's licm hoists the expensive op out of the loop and the loop times
    only the cheap remainder (see the hoisting post-mortem in
    :func:`_device_loop_ms`).  Factored out module-level so the HLO
    regression test can compile it standalone and assert the convolution
    stays inside the while-loop body.
    """
    import functools

    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=0)
    def run(n, *leaves):
        def body(i, acc):
            ls = list(leaves)
            for j in f_idxs:
                ls[j] = ls[j] + acc.astype(ls[j].dtype)
            outs = fn(*jax.tree.unflatten(treedef, ls))
            tot = sum(
                jnp.sum(o.astype(jnp.float32))
                for o in jax.tree.leaves(outs)
            )
            return acc + tot * jnp.float32(1e-30)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    return run


def _device_loop_ms(fn, args, iters: int, repeats: int = 1) -> float:
    """K-vs-1 difference timing: run ``fn`` inside an on-device
    ``lax.fori_loop`` of n iterations (one dispatch + one scalar fetch per
    measurement) and report (T(K) - T(1)) / (K - 1).

    ``repeats`` > 1 measures each ENDPOINT that many times and differences
    the per-endpoint minima: min(T(K)) - min(T(1)).  Taking the min of the
    K-vs-1 DIFFERENCES instead is negatively biased -- it selects exactly
    the samples where a transport hiccup inflated T(1) (measured round 5:
    ECO-Full's conv2_3x3 at 2.227 ms == 239 TF/s, above the 197 TF/s chip
    peak; the honest endpoint-min gives 3.3 ms).  The per-endpoint min is
    the standard hiccup-immune estimator: noise on this relay is one-sided
    (delays only), so the minimum converges on the true time.

    This removes the fixed per-call host round-trip, which through a remote
    relay (~30 ms/fetch) otherwise dominates every layer under a few ms --
    the host-loop method reports dispatch latency, not compute.  The loop
    body perturbs EVERY float input with the carry so no operand is
    loop-invariant.

    Perturbing only ONE leaf is not enough: jax.tree.flatten sorts dict
    keys, so for a folded conv ({"b", "w"}) the first float leaf is the
    bias -- the body becomes ``conv(x, w) + (b + acc)`` and XLA's
    loop-invariant code motion hoists the conv out of the while loop,
    timing only the broadcast add (measured round 5 on ECO-Full's 3D head:
    res4a_1 0.000 ms, res3b_1 0.231 ms vs a 486 GF physical floor of
    ~2.5 ms; conv2_3x3 reported exactly its output-sized add, 2.285 ms ==
    925 MB read+write).  With x, w, AND b all carrying ``acc``, the conv
    depends on the carry through both operands and cannot be hoisted or
    algebraically split without a bilinear expansion XLA does not do.
    The added perturbation work fuses into each operand's existing read,
    so measured times are unchanged for layers that were timed honestly
    before (pinned by test_profiler_keeps_conv_in_loop).
    """
    import functools

    import jax.numpy as jnp

    leaves, treedef = jax.tree.flatten(args)
    f_idxs = [
        i for i, l in enumerate(leaves)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.inexact)
    ]
    if not f_idxs:
        # No float leaf to perturb -> the loop body would be loop-invariant
        # and XLA would hoist it, reporting ~0 ms.  Fall back to host-loop
        # timing with a scalar-fetch barrier per call (includes dispatch
        # latency, but is honest; int-only layers are cheap anyway).
        run1 = jax.jit(
            lambda *ls: sum(
                jnp.sum(o.astype(jnp.float32))
                for o in jax.tree.leaves(fn(*jax.tree.unflatten(treedef, ls)))
            )
        )
        float(run1(*leaves))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(max(iters, 2)):
            float(run1(*leaves))
        return (time.perf_counter() - t0) / max(iters, 2) * 1e3

    run = _make_timing_loop(fn, treedef, f_idxs)

    def timed(n):
        # float() scalar fetch, NOT block_until_ready: through the axon
        # relay block_until_ready can return before compute finishes (on
        # both AOT and jit results); a host fetch of the loop-carried
        # scalar cannot -- the value only exists once the loop ran.
        float(run(n, *leaves))  # compile + warm
        t0 = time.perf_counter()
        float(run(n, *leaves))
        return time.perf_counter() - t0

    r = max(repeats, 1)
    t1 = min(timed(1) for _ in range(r))
    tk = min(timed(max(iters, 2) + 1) for _ in range(r))
    return max(tk - t1, 0.0) / max(iters, 2) * 1e3


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
    method: str = "auto",
    repeats: int = 1,
):
    """Per-layer micro-benchmark.

    Returns [(layer_name, type, fwd_ms)] or, with ``backward=True``,
    [(layer_name, type, fwd_ms, bwd_ms)] where bwd is the layer's VJP on its
    inputs+params (what ``caffe time`` reports per layer,
    tools/caffe.cpp:318-357).

    ``method``: "host" times a host loop with a blocking fetch per call
    (fine locally; relay-dominated over remote transports), "device_loop"
    uses the K-vs-1 on-device fori_loop difference method, "auto" picks
    device_loop on TPU and host elsewhere.  ``repeats`` > 1 measures each
    loop endpoint that many times and differences the per-endpoint minima
    -- use 2-3 on flaky transports (a single hiccup otherwise inflates or,
    worse, DEFLATES one layer's time; see _device_loop_ms).
    """
    if rng is None and program.train:
        rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp

    ctx = Context(train=program.train, rng=rng, compute_dtype=program.compute_dtype)
    rows = []
    if method == "auto":
        method = "device_loop" if jax.default_backend() == "tpu" else "host"

    # Stream blob values instead of precollecting all of them: holding every
    # intermediate of a large-batch run at once OOMs HBM (observed at 1536
    # frames on a 16 GB chip).  Track per-blob consumer counts and free each
    # value after its last consuming layer was benched.
    remaining: dict = {}
    for l in program.exec_layers:
        for b in l.bottoms:
            remaining[b] = remaining.get(b, 0) + 1
    blobs = {k: program.cast_input(v) for k, v in inputs.items()}

    def bench(fn, args):
        if method == "device_loop":
            # repeats are differenced per ENDPOINT inside _device_loop_ms
            # (min of the diffs themselves is negatively biased, see there)
            return _device_loop_ms(fn, args, iters, repeats)
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

        outs, _ = impl.apply(layer, lp, ls, ins, ctx)
        del ins
        for b in layer.bottoms:
            remaining[b] -= 1
            if remaining[b] == 0:
                blobs.pop(b, None)  # free before in-place tops re-assign
        for t, o in zip(layer.tops, outs):
            blobs[t] = o
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
