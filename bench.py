"""Headline benchmarks on one chip -- every README perf claim, one JSON line.

Primary metric: ECO-Lite 16-segment inference throughput (videos/s) vs the
reference's "up to 230 videos/s" single-GPU claim (reference README.md:22;
BASELINE.md).  ``extra`` carries the other driver-captured numbers: ECO-Full
inference, bf16 training step, and model TF/s + MFU vs the v5e bf16 peak.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "videos/s", "vs_baseline": N/230,
   "extra": {...}}
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_VIDEOS_PER_SEC = 230.0
V5E_BF16_PEAK_FLOPS = 197e12  # per chip
_T0 = time.perf_counter()
if os.environ.get("ECO_BENCH_CACHE_DIR"):  # opt-in persistent compile cache
    # Left off by default: through the axon relay a cache-deserialized
    # executable was observed to pay its full compile cost on FIRST RUN
    # instead (so the cache saves nothing and skews the warmup), while on
    # local devices it works as expected.
    jax.config.update("jax_compilation_cache_dir", os.environ["ECO_BENCH_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# Skip remaining extras once this much wall time has elapsed, so the primary
# JSON line always prints even under a driver timeout.
# r03 used 995s of 1000; r04 adds the uint8 online loop + train_e2e
# (~280s).  Stages are priority-ordered in main() so a cut drops the
# flat cross-round trackers first.
WALL_BUDGET_S = float(os.environ.get("ECO_BENCH_WALL_BUDGET_S", "1400"))


def _note(msg):
    print(f"[bench +{time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _sync(out):
    """Barrier that provably waits for device completion.

    Through the axon relay, block_until_ready on the result of an
    AOT-compiled call can return before the compute finishes (observed:
    0.7 ms "wait" on an 11 ms matmul chain).  A scalar host fetch cannot
    lie: the value only exists once the executable ran.  Single-device
    XLA executables run in dispatch order, so syncing the LAST dispatched
    output syncs everything before it."""
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))


def _pipelined_time(fn, args_variants, iters, warmup=2, passes=2):
    """Dispatch iters calls over rotating inputs, then one scalar-fetch
    barrier on the last output.  Through the axon relay each host
    round-trip costs ~30 ms, so a serial fetch-per-iteration under-reports
    device throughput; pipelining overlaps the round-trips with compute
    (serving shape).  Cross-checked in round 1 against a device-side
    lax.fori_loop measurement (within 5%).

    min-of-``passes`` (VERDICT r3 #2): a single relay hiccup inside the
    timed window inflates dt for the whole pass; taking the best of two
    independent passes makes the headline regression-proof the same way
    bench_preprocess_kernel already is."""
    for v in args_variants[:warmup]:
        _sync(fn(*v))
    best = float("inf")
    for _ in range(max(1, passes)):
        t0 = time.perf_counter()
        outs = [fn(*args_variants[i % len(args_variants)]) for i in range(iters)]
        _sync(outs[-1])
        best = min(best, (time.perf_counter() - t0) / iters)
        for o in outs:
            jax.block_until_ready(o)
    return best


def _infer_setup(zoo_name, batch, num_segments=16):
    from eco_tpu.convert import optimize_for_inference
    from eco_tpu.models import get_model
    from eco_tpu.runtime import Program

    graph = get_model(zoo_name, num_segments=num_segments, batch=batch)
    prog0 = Program(graph, train=False)
    # Generate inputs ON DEVICE: through the axon relay a host->device copy of
    # a (96,16,224,224,3) batch costs tens of seconds; jax.random costs ~ms.
    data = jax.block_until_ready(
        jax.random.normal(
            jax.random.PRNGKey(7),
            (batch, num_segments, 224, 224, 3),
            dtype=jnp.bfloat16,
        )
    )
    params, state = prog0.init(jax.random.PRNGKey(0), {"data": data})
    _note("init done")
    graph, params, state = optimize_for_inference(graph, params, state)
    _note("optimize_for_inference done")
    prog = Program(graph, train=False, compute_dtype=jnp.bfloat16)

    @jax.jit
    def fwd(params, state, data):
        outs, _ = prog.apply(params, state, {"data": data})
        return outs["probs"]

    return fwd, params, state, data


def bench_infer(zoo_name, batch, iters=10, with_cost=False):
    _note(f"infer setup {zoo_name} b={batch}")
    fwd, params, state, data = _infer_setup(zoo_name, batch)
    # AOT-compile once; reuse the same executable for timing AND cost
    # analysis (a second .lower().compile() would recompile from scratch).
    compiled = fwd.lower(params, state, data).compile()
    _note("compiled")
    variants = [
        jax.block_until_ready(data + jnp.bfloat16(i * 1e-3)) for i in range(2)
    ]
    dt = _pipelined_time(
        lambda d: compiled(params, state, d), [(v,) for v in variants], iters
    )
    _note(f"timed: {batch / dt:.1f} v/s")
    out = {"videos_per_sec": batch / dt, "step_ms": dt * 1e3, "batch": batch}
    if with_cost:
        try:
            cost = compiled.cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
            if flops > 0:
                out["tflops_per_sec"] = flops / dt / 1e12
                out["mfu_vs_v5e_bf16_peak"] = flops / dt / V5E_BF16_PEAK_FLOPS
        except Exception as e:  # cost analysis is backend-dependent
            out["cost_analysis_error"] = repr(e)
    return out


def bench_train(batch=16, num_segments=16, iters=8, with_cost=True):
    """bf16 ECO-Lite training step: fwd+bwd+Nesterov/clip update, b videos.

    Reports train-side MFU from the compiled executable's cost analysis
    (VERDICT r2 #4: the inference side always had it; the train side now
    does too, so the train:infer efficiency ratio is measurable)."""
    from eco_tpu.models import get_model
    from eco_tpu.runtime import Program
    from eco_tpu.train.solver import (
        SolverConfig, init_train_state, make_train_step,
    )

    graph = get_model(
        "eco_lite_kinetics", num_segments=num_segments, batch=batch,
        with_loss=True,
    )
    prog = Program(graph, train=True, compute_dtype=jnp.bfloat16)
    cfg = SolverConfig(iter_size=1, solver_type="nesterov", clip_gradients=40.0)
    data = jax.random.normal(
        jax.random.PRNGKey(3),
        (1, batch, num_segments, 224, 224, 3),
        dtype=jnp.bfloat16,
    )
    label = jax.random.randint(jax.random.PRNGKey(4), (1, batch), 0, 400)
    params, state = prog.init(
        jax.random.PRNGKey(0), {"data": data[0], "label": label[0]}
    )
    ts = init_train_state(params, state)
    step_fn = jax.jit(make_train_step(prog, cfg))
    key = jax.random.PRNGKey(1)
    batch_d = {"data": data, "label": label}
    compiled = step_fn.lower(ts, batch_d, key).compile()
    # steps chain through ts (true serial dependency); fetch once at the end
    ts, m = compiled(ts, batch_d, key)
    float(m["loss"])  # scalar fetch = provable device barrier (see _sync)
    dt = float("inf")
    for _ in range(2):  # min-of-2 passes (relay-hiccup-proof, see _pipelined_time)
        t0 = time.perf_counter()
        for _ in range(iters):
            ts, m = compiled(ts, batch_d, key)
        float(m["loss"])
        dt = min(dt, (time.perf_counter() - t0) / iters)
    out = {"videos_per_sec": batch / dt, "step_ms": dt * 1e3, "batch": batch}
    if with_cost:
        try:
            cost = compiled.cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
            if flops > 0:
                out["tflops_per_sec"] = flops / dt / 1e12
                out["mfu_vs_v5e_bf16_peak"] = flops / dt / V5E_BF16_PEAK_FLOPS
        except Exception as e:
            out["cost_analysis_error"] = repr(e)
    return out


def bench_train_e2e(batch=8, num_segments=16, steps=4, n_videos=24,
                    n_frames=24):
    """End-to-end `eco train` throughput with the REAL video data plane
    (VERDICT r3 #6): a synthetic frame-dir dataset (the reference's
    `path n_frames label` list format) -> VideoPipeline on the raw uint8
    plane (prefetch thread pool, segment sampling, fix-crop augmentation
    decisions) -> RawPreprocessProgram train step (on-chip crop/mirror/
    mean via the Pallas kernel inside the jitted step).

    Reports the full-loop rate plus the host-only (pipeline drain) and
    chip-only (repeated step) rates, so the host:chip utilization split is
    explicit -- this 1-core bench box decodes far slower than the chip
    trains; the split is the point of the measurement (reference
    base_data_layer.cpp:42-91 prefetch concurrency)."""
    import dataclasses
    import tempfile

    import cv2

    from eco_tpu.apps.serving import RawPreprocessProgram
    from eco_tpu.data import VideoDataConfig, VideoPipeline
    from eco_tpu.models import get_model
    from eco_tpu.runtime import Program
    from eco_tpu.train.solver import (
        SolverConfig, init_train_state, make_train_step,
    )

    root = os.path.join(tempfile.gettempdir(), "eco_bench_e2e_videos")
    lst = os.path.join(root, "list.txt")
    if not os.path.exists(lst):
        os.makedirs(root, exist_ok=True)
        rng = np.random.default_rng(0)
        lines = []
        base = rng.integers(0, 200, (256, 340, 3), np.uint8)
        for v in range(n_videos):
            d = os.path.join(root, f"vid{v}")
            os.makedirs(d, exist_ok=True)
            for f in range(n_frames):
                img = np.clip(
                    base.astype(np.int16) + int(v * 3 + f) % 40, 0, 255
                ).astype(np.uint8)
                cv2.imwrite(os.path.join(d, "img_%04d.jpg" % (f + 1)), img)
            lines.append(f"{d} {n_frames} {v % 10}")
        with open(lst, "w") as f:
            f.write("\n".join(lines) + "\n")

    dcfg = VideoDataConfig(
        source=lst, batch_size=batch, num_segments=num_segments,
        new_height=256, new_width=340, shuffle=True, raw=True,
    )
    graph = get_model(
        "eco_lite_kinetics", num_segments=num_segments, batch=batch,
        with_loss=True,
    )
    prog = RawPreprocessProgram(
        Program(graph, train=True, compute_dtype=jnp.bfloat16),
        crop=dcfg.transform.crop_size, mean=dcfg.transform.mean_values,
    )
    cfg = SolverConfig(iter_size=1, solver_type="nesterov", clip_gradients=40.0)
    pipe = VideoPipeline(dcfg, train=True, seed=0)
    try:
        def micro(b):
            return {k: np.stack([v]) for k, v in b.items()}

        first = micro(pipe.next_batch())
        params, state = prog.init(
            jax.random.PRNGKey(0), {k: v[0] for k, v in first.items()}
        )
        ts = init_train_state(params, state)
        step_fn = jax.jit(make_train_step(prog, cfg))
        key = jax.random.PRNGKey(1)
        ts, m = step_fn(ts, first, key)  # compile
        float(m["loss"])

        # Serial vs overlapped feed, INTERLEAVED A/B (VERDICT r4 weak #1,
        # re-hardened round 5): running each variant as its own multi-minute
        # phase let the relay's 2-3x weather swings pick the winner (three
        # same-run checks produced three orderings).  Now the variants
        # alternate in short blocks -- serial, depth-1, depth-2, repeated --
        # so all three sample the same link conditions within seconds.
        # Each overlap block uses a source generator bounded to exactly the
        # block's steps: prefetch_to_device dispatches puts eagerly on
        # fill(), so a bounded source means every dispatched DMA is
        # consumed inside the block's own timed region -- no in-flight
        # transfer bleeds into the next block and no untimed head start.
        from eco_tpu.data import prefetch_to_device

        rounds = max(steps // 2, 1)
        bsteps = 2
        totals = {"serial": 0.0, 1: 0.0, 2: 0.0}
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(bsteps):
                b = micro(pipe.next_batch())
                ts, m = step_fn(ts, b, key)
                float(m["loss"])
            totals["serial"] += time.perf_counter() - t0

            for depth in (1, 2):
                t0 = time.perf_counter()
                feed = prefetch_to_device(
                    (micro(pipe.next_batch()) for _ in range(bsteps)), depth
                )
                pend = None
                for dev_b in feed:
                    ts, m = step_fn(ts, dev_b, key)
                    if pend is not None:
                        float(pend["loss"])
                    pend = m
                float(pend["loss"])
                totals[depth] += time.perf_counter() - t0

        n = rounds * bsteps
        full_dt = totals["serial"] / n
        overlap_dt = {1: totals[1] / n, 2: totals[2] / n}

        # host-only: drain the pipeline
        t0 = time.perf_counter()
        for _ in range(steps):
            pipe.next_batch()
        host_dt = (time.perf_counter() - t0) / steps

        # put-only: H2D transfer rate of one resident-shape batch (the
        # pipeline bound on a transfer-limited link)
        t0 = time.perf_counter()
        for _ in range(steps):
            jax.block_until_ready(jax.device_put(first))
        put_dt = (time.perf_counter() - t0) / steps

        # chip-only: repeat the step on the resident batch
        dev = jax.device_put(first)
        ts, m = step_fn(ts, dev, key)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(steps):
            ts, m = step_fn(ts, dev, key)
        float(m["loss"])
        chip_dt = (time.perf_counter() - t0) / steps
    finally:
        pipe.close()
    return {
        "train_e2e_videos_per_sec": round(batch / full_dt, 1),
        "train_e2e_overlap_videos_per_sec": round(batch / overlap_dt[1], 1),
        "train_e2e_overlap_q2_videos_per_sec": round(batch / overlap_dt[2], 1),
        "train_e2e_host_videos_per_sec": round(batch / host_dt, 1),
        "train_e2e_put_videos_per_sec": round(batch / put_dt, 1),
        "train_e2e_chip_videos_per_sec": round(batch / chip_dt, 1),
        "train_e2e_batch": batch,
    }


def bench_online(num_streams=64, ticks=3, num_segments=16):
    """The online-setting benchmark (VERDICT r2 #3) -- the direct
    apples-to-apples for the reference's "up to 230 videos/s online"
    (reference README.md:22, scripts/online_recognition/online_recognition.py
    :64-98): N concurrent webcam-style streams through
    MultiStreamRecognizer (16-frame windows, destructive window memory,
    running-mean logits), one batched forward per tick.

    Numbers: ``online_videos_per_sec`` is the FULL loop on the raw uint8
    plane (VERDICT r3 #4: host does resize+crop only, uint8 to the chip,
    Pallas mean/bf16 on-device), ``online_f32_videos_per_sec`` the classic
    host-side-f32 loop for contrast (host-bound on this 1-core bench box;
    the reference ran its loop on a workstation CPU), and
    ``online_chip_videos_per_sec`` the window-forward rate with
    device-resident clips -- the chip's serving capability.
    """
    from eco_tpu.apps.online import MultiStreamRecognizer
    from eco_tpu.convert import optimize_for_inference
    from eco_tpu.models import get_model
    from eco_tpu.runtime import Program

    graph = get_model(
        "eco_lite_kinetics", num_segments=num_segments, batch=num_streams
    )
    prog0 = Program(graph, train=False)
    zero = jnp.zeros((num_streams, num_segments, 224, 224, 3), jnp.bfloat16)
    params, state = prog0.init(jax.random.PRNGKey(0), {"data": zero})
    graph, params, state = optimize_for_inference(graph, params, state)
    prog = Program(graph, train=False, compute_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (256, 340, 3), np.uint8)
              for _ in range(num_streams)]

    def timed_loop(plane, n_ticks):
        rec = MultiStreamRecognizer(
            prog, params, state, num_streams=num_streams,
            num_segments=num_segments, plane=plane,
        )

        def one_tick():
            for _ in range(num_segments):
                res = rec.push_frames(frames)
            assert all(r is not None for r in res)

        one_tick()  # fills windows + compiles the batched forward
        best = float("inf")
        for _ in range(n_ticks):
            t0 = time.perf_counter()
            one_tick()
            best = min(best, time.perf_counter() - t0)
        return num_streams / best

    out = {
        "online_videos_per_sec": round(timed_loop("uint8", ticks), 1),
        # one timed f32 tick: it's a ~37s/tick same-run CONTRAST number
        # (the plane the uint8 path replaced), not a tracked metric
        "online_f32_videos_per_sec": round(timed_loop("f32", 1), 1),
        "online_streams": num_streams,
        "online_plane": "uint8",
    }

    # chip-side tick: same forward, clips already on device
    clips = jax.block_until_ready(jax.random.normal(
        jax.random.PRNGKey(2), (num_streams, num_segments, 224, 224, 3),
        jnp.bfloat16,
    ))

    @jax.jit
    def fwd(params, state, data):
        outs, _ = prog.apply(params, state, {"data": data})
        return outs["probs"]

    compiled = fwd.lower(params, state, clips).compile()
    variants = [jax.block_until_ready(clips + jnp.bfloat16(i * 1e-3))
                for i in range(2)]
    cdt = _pipelined_time(
        lambda d: compiled(params, state, d), [(v,) for v in variants], iters=8
    )
    out["online_chip_videos_per_sec"] = round(num_streams / cdt, 1)

    # uint8-plane chip ticks, float vs int8 (VERDICT r4 weak #3a): device-
    # resident cropped frames through the SAME jitted preprocess+forward
    # the online loop runs.  The int8 variant quantizes the graph and fuses
    # input quantization into the Pallas preprocess (int8_input_rewrite),
    # so conv1 eats wire int8 -- the serving-side effect of quantization,
    # same-run against its float twin.
    from eco_tpu.convert.quantize import quantize_for_serving
    from eco_tpu.ops.pallas.preprocess import preprocess_on_device

    fr = [
        jax.block_until_ready(jax.device_put(
            rng.integers(0, 256, (num_streams, num_segments, 224, 224, 3),
                         np.uint8)
        ))
        for _ in range(2)
    ]
    zeros = jnp.zeros((num_streams,), jnp.int32)
    nomirror = jnp.zeros((num_streams,), bool)

    def u8_fwd(pr, scale):
        @jax.jit
        def f(params, state, frames):
            clips = preprocess_on_device(
                frames, zeros, zeros, nomirror, crop=224,
                out_dtype=jnp.bfloat16, act_scale=scale,
            )
            outs, _ = pr.apply(params, state, {"data": clips})
            return outs["probs"]
        return f

    f_float = u8_fwd(prog, None).lower(params, state, fr[0]).compile()
    fdt = _pipelined_time(
        lambda d: f_float(params, state, d), [(v,) for v in fr], iters=8
    )
    out["online_chip_u8_videos_per_sec"] = round(num_streams / fdt, 1)
    _note("online: int8 quantize")

    @jax.jit
    def calib_clips(frames):
        return preprocess_on_device(
            frames, zeros, zeros, nomirror, crop=224, out_dtype=jnp.float32,
        )

    qprog, qp, qs, _ = quantize_for_serving(
        prog, params, state, [{"data": calib_clips(fr[0])}], fold=False,
        compute_dtype=jnp.bfloat16,
    )
    from eco_tpu.convert.quantize import int8_input_rewrite
    from eco_tpu.runtime import Program as _Program

    qg, in_scale = int8_input_rewrite(qprog.graph)
    if in_scale is not None:
        qprog = _Program(qg, train=False, compute_dtype=jnp.bfloat16)
    f_int8 = u8_fwd(qprog, in_scale).lower(qp, qs, fr[0]).compile()
    qdt = _pipelined_time(
        lambda d: f_int8(qp, qs, d), [(v,) for v in fr], iters=8
    )
    out["online_chip_int8_videos_per_sec"] = round(num_streams / qdt, 1)
    out["online_int8_input_plane"] = in_scale is not None
    return out


def bench_preprocess_kernel(n=8, s=16, hw=(256, 340), crop=224, iters=128,
                            repeats=3):
    """Device-side A/B of the Pallas crop_normalize kernel (VERDICT r2 #5):
    kernel ms vs an XLA dynamic-slice+subtract baseline at the serving shape,
    plus the HBM roofline floor, measured with the K-vs-1-proof device loop
    (same method as the pool study in docs/PERF_NOTES.md)."""
    import functools

    from jax import lax

    from eco_tpu.ops.pallas.preprocess import crop_normalize

    h, w = hw
    t = n * s
    frames = jax.block_until_ready(jax.random.randint(
        jax.random.PRNGKey(0), (t, h, w * 3), 0, 255, jnp.uint8
    ))
    offs = jax.block_until_ready(jnp.stack([
        jax.random.randint(jax.random.PRNGKey(1), (t,), 0, h - crop),
        jax.random.randint(jax.random.PRNGKey(2), (t,), 0, w - crop) * 3,
    ], axis=1).astype(jnp.int32))
    mean_row = jnp.tile(jnp.asarray([104.0, 117.0, 123.0], jnp.float32), crop)

    def pallas_fn(frames, offs):
        return crop_normalize(frames, offs, mean_row, crop=crop)

    def xla_fn(frames, offs):
        def one(fr, off):
            win = lax.dynamic_slice(fr, (off[0], off[1]), (crop, crop * 3))
            return (win.astype(jnp.float32) - mean_row).astype(jnp.bfloat16)
        return jax.vmap(one)(frames, offs)

    def timed(fn):
        @functools.partial(jax.jit, static_argnames=("k",))
        def loop(frames, offs, k):
            def body(c, _):
                # vary offsets so iterations cannot be CSE'd away
                o = (offs + c) % jnp.asarray([h - crop, (w - crop) * 3])
                out = fn(frames, o.astype(jnp.int32))
                return c + 1, jnp.sum(out[:, 0, 0].astype(jnp.float32))
            _, sums = lax.scan(body, jnp.int32(0), None, length=k)
            return jnp.sum(sums)
        float(loop(frames, offs, k=1))       # compile both lengths
        float(loop(frames, offs, k=iters + 1))

        def once(k):
            t = time.perf_counter()
            float(loop(frames, offs, k=k))
            return time.perf_counter() - t
        # min-of-repeats on each length: a single relay hiccup (~20ms) would
        # otherwise dwarf the sub-ms op and can even make the diff negative
        t_one = min(once(1) for _ in range(repeats))
        t_many = min(once(iters + 1) for _ in range(repeats))
        return (t_many - t_one) / iters * 1e3  # ms per invocation

    pallas_ms = timed(pallas_fn)
    xla_ms = timed(xla_fn)
    # HBM floor: read the aligned uint8 superset window + write bf16 crop
    read_b = t * (crop + 8) * (-(-(crop * 3 + 128) // 128) * 128)
    write_b = t * crop * crop * 3 * 2
    floor_ms = (read_b + write_b) / 819e9 * 1e3  # v5e ~819 GB/s
    return {
        "preprocess_pallas_ms": round(pallas_ms, 3),
        "preprocess_xla_ms": round(xla_ms, 3),
        "preprocess_hbm_floor_ms": round(floor_ms, 3),
        "preprocess_shape": f"{n}x{s}x{h}x{w}",
    }


def bench_int8_infer(zoo_name="eco_lite_kinetics", batch=96, iters=10,
                     prefix="int8"):
    """int8 post-training-quantized serving throughput vs the bf16 path.

    w8a8: per-channel int8 weights, calibrated per-tensor activation scales
    (eco_tpu.convert.quantize) -- the MXU runs int8 x int8 -> int32 at ~2x
    the bf16 rate on v5e, so this bounds the quantized-serving headroom.
    Calibration uses the same random-normal data as the timing run
    (accuracy parity is covered by tests/test_quantize.py; this measures
    throughput only).
    """
    from eco_tpu.convert import optimize_for_inference
    from eco_tpu.convert.quantize import quantize_for_serving
    from eco_tpu.models import get_model
    from eco_tpu.runtime import Program

    graph = get_model(zoo_name, num_segments=16, batch=batch)
    prog0 = Program(graph, train=False)
    data = jax.block_until_ready(
        jax.random.normal(
            jax.random.PRNGKey(7), (batch, 16, 224, 224, 3), dtype=jnp.bfloat16
        )
    )
    params, state = prog0.init(jax.random.PRNGKey(0), {"data": data})
    _note("int8: init done")
    # same graph optimizations as the bf16 path (sibling-1x1 merge + BN
    # fold) so the comparison isolates the int8 MXU effect
    graph, params, state = optimize_for_inference(graph, params, state)
    prog1 = Program(graph, train=False, compute_dtype=jnp.bfloat16)
    qprog, qp, qs, report = quantize_for_serving(
        prog1, params, state, [{"data": data}], fold=False,
        compute_dtype=jnp.bfloat16,
    )
    _note(f"int8: quantized {len(report['quantized'])} layers")

    @jax.jit
    def fwd(qp, qs, data):
        outs, _ = qprog.apply(qp, qs, {"data": data})
        return outs["probs"]

    compiled = fwd.lower(qp, qs, data).compile()
    _note("int8: compiled")
    variants = [
        jax.block_until_ready(data + jnp.bfloat16(i * 1e-3)) for i in range(2)
    ]
    dt = _pipelined_time(
        lambda d: compiled(qp, qs, d), [(v,) for v in variants], iters
    )
    _note(f"{prefix}: timed {batch / dt:.1f} v/s")
    return {
        f"{prefix}_videos_per_sec": round(batch / dt, 1),
        f"{prefix}_quantized_layers": len(report["quantized"]),
        f"{prefix}_chained_layers": len(report.get("chained", [])),
        f"{prefix}_batch": batch,
    }


def bench_serving(batch=8, num_segments=16, hw=(256, 340), iters=3):
    """End-to-end serving: HOST numpy frames -> device -> probs fetched.

    Contrasts the raw-uint8 plane (UInt8Server: ship uint8, Pallas
    crop/mean/bf16 on-chip) with the classic host-side-f32 plane at the same
    batch.  Includes the host->device transfer, which is the point: through
    the axon relay (~10 MB/s) the 4x smaller uint8 payload dominates; on a
    production host the same ratio applies to PCIe/DMA time.
    """
    from eco_tpu.apps.serving import UInt8Server
    from eco_tpu.convert import optimize_for_inference
    from eco_tpu.models import get_model
    from eco_tpu.runtime import Program

    h, w = hw
    crop = 224
    graph = get_model("eco_lite_kinetics", num_segments=num_segments, batch=batch)
    prog0 = Program(graph, train=False)
    zero = jnp.zeros((batch, num_segments, crop, crop, 3), jnp.bfloat16)
    params, state = prog0.init(jax.random.PRNGKey(0), {"data": zero})
    graph, params, state = optimize_for_inference(graph, params, state)
    prog = Program(graph, train=False, compute_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    frames_u8 = rng.integers(
        0, 255, (batch, num_segments, h, w, 3), dtype=np.uint8
    )
    # pre-transformed f32 host path: crop+mean on host, ship f32
    mean = np.asarray([104.0, 117.0, 123.0], np.float32)
    y0, x0 = (h - crop) // 2, (w - crop) // 2
    clips_f32 = (
        frames_u8[:, :, y0:y0 + crop, x0:x0 + crop, :].astype(np.float32) - mean
    )

    server = UInt8Server(prog, params, state)

    @jax.jit
    def fwd(params, state, data):
        outs, _ = prog.apply(params, state, {"data": data})
        return outs["probs"]

    def run_u8():
        return np.asarray(server(jnp.asarray(frames_u8)))

    def run_f32():
        return np.asarray(fwd(params, state, jnp.asarray(clips_f32)))

    # Hiccup-robust timing (VERDICT r3 #4): each call is an independent
    # end-to-end round trip, so take the MIN over iters single-call times --
    # one ~20ms relay stall no longer poisons the whole mean (r02->r03 saw a
    # 2.5x swing from exactly this).  Also report the payload size and the
    # transfer-only time so the transfer/compute split is explicit.
    out = {}
    for name, fn, payload in (
        ("uint8_onchip", run_u8, frames_u8),
        ("f32_host", run_f32, clips_f32),
    ):
        fn()  # warmup/compile
        best = float("inf")
        for _ in range(max(3, iters)):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        out[f"serving_{name}_videos_per_sec"] = round(batch / best, 2)
        out[f"serving_{name}_payload_mb"] = round(payload.nbytes / 1e6, 1)
        # transfer-only: ship the payload and barrier, no compute
        tbest = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(jnp.asarray(payload))
            tbest = min(tbest, time.perf_counter() - t0)
        out[f"serving_{name}_transfer_ms"] = round(tbest * 1e3, 1)
    out["serving_batch"] = batch
    return out


def bench_pool_kernels(n=512, iters=10):
    """Round-1 VERDICT item 5, driver-captured: XLA reduce_window vs the
    experimental Pallas fused pool (docs/PERF_NOTES.md) on the pool1 shape.
    The delta is honest: XLA wins; the kernel stays opt-in."""
    import functools

    from jax import lax

    from eco_tpu.ops.pallas.poolfuse import fused_maxpool_3x3s2
    from eco_tpu.ops.pool import pool_nd

    y = jax.block_until_ready(jax.random.normal(
        jax.random.PRNGKey(5), (n, 112, 112, 64), jnp.bfloat16))

    def timed(fn):
        @jax.jit
        def loop(c, y):
            def step(c, _):
                o = fn(y * (1 + c).astype(y.dtype))
                return jnp.sum(o, dtype=jnp.float32) * jnp.float32(1e-12), ()
            c, _ = lax.scan(step, c, None, length=iters)
            return c
        float(loop(jnp.float32(0), y))  # compile + warm (scalar barrier)
        t0 = time.perf_counter()
        float(loop(jnp.float32(0), y))
        return (time.perf_counter() - t0) / iters * 1e3

    xla_ms = timed(functools.partial(pool_nd, kernel=3, stride=2, mode="max"))
    pallas_ms = timed(fused_maxpool_3x3s2)
    return {
        "pool1_xla_ms_512f": round(xla_ms, 2),
        "pool1_pallas_ms_512f": round(pallas_ms, 2),
    }


def main():
    batches = tuple(
        int(b) for b in os.environ.get("ECO_BENCH_BATCHES", "96").split(",")
    )
    extra: dict = {}
    best = 0.0
    errors = []
    for batch in batches:
        # batch 96 is the measured sweet spot on v5e (1184 v/s vs 1151 @ 64,
        # 1161 @ 128); override with ECO_BENCH_BATCHES=a,b,...
        try:
            r = bench_infer("eco_lite_kinetics", batch, with_cost=True)
        except Exception as e:  # try remaining batch sizes, but never
            import traceback     # mask total failure as a 0.0 score

            traceback.print_exc()
            errors.append(e)
            continue
        if r["videos_per_sec"] > best:
            best = r["videos_per_sec"]
            for k in ("tflops_per_sec", "mfu_vs_v5e_bf16_peak"):
                if k in r:
                    extra[f"eco_lite_{k}"] = round(r[k], 3)
    if best == 0.0 and errors:
        raise errors[0]

    def _over_budget(what):
        if time.perf_counter() - _T0 > WALL_BUDGET_S:
            _note(f"wall budget exceeded; skipping {what}")
            extra[f"{what}_skipped"] = "wall_budget"
            return True
        return False

    if os.environ.get("ECO_BENCH_SKIP_EXTRAS", "0") != "1":
        # Stages run in PRIORITY order so a budget cut drops the stable
        # cross-round trackers, not the round-over-round gates: int8 and
        # serving/online/train_e2e are VERDICT-tracked deltas; eco_full and
        # the train MFU have been flat for three rounds (844/840 v/s,
        # 0.375-0.383).  The headline already ran above.
        if not _over_budget("int8_infer"):
            try:
                _note("int8 infer bench")
                r8 = bench_int8_infer()
                extra.update(r8)
                if best > 0:
                    extra["int8_speedup_vs_bf16"] = round(
                        r8["int8_videos_per_sec"] / best, 2
                    )
            except Exception as e:
                extra["int8_infer_error"] = repr(e)
        if not _over_budget("serving"):
            try:
                _note("serving bench")
                extra.update(bench_serving())
            except Exception as e:
                extra["serving_error"] = repr(e)
        if not _over_budget("online"):
            try:
                _note("online bench")
                extra.update(bench_online())
            except Exception as e:
                extra["online_error"] = repr(e)
        if not _over_budget("train_e2e"):
            try:
                _note("train e2e bench (real data plane)")
                extra.update(bench_train_e2e())
            except Exception as e:
                extra["train_e2e_error"] = repr(e)
        train_batches = tuple(
            int(b)
            for b in os.environ.get("ECO_BENCH_TRAIN_BATCHES", "32").split(",")
        )
        best_train = 0.0
        for tb in train_batches:
            # b=32 is the measured training sweet spot (r03: 303.4 v/s vs
            # 297.3 @ 16, 302.8 @ 64); sweep with ECO_BENCH_TRAIN_BATCHES
            if _over_budget(f"train_bf16_b{tb}"):
                break
            try:
                _note(f"train bench b={tb}")
                rt = bench_train(batch=tb)
                extra[f"train_bf16_b{tb}_videos_per_sec"] = round(rt["videos_per_sec"], 1)
                if "mfu_vs_v5e_bf16_peak" in rt:
                    extra[f"train_bf16_b{tb}_mfu"] = round(rt["mfu_vs_v5e_bf16_peak"], 3)
                if rt["videos_per_sec"] > best_train:
                    best_train = rt["videos_per_sec"]
                    extra["train_bf16_videos_per_sec_per_chip"] = round(rt["videos_per_sec"], 1)
                    extra["train_bf16_step_ms"] = round(rt["step_ms"], 1)
            except Exception as e:
                extra[f"train_bf16_b{tb}_error"] = repr(e)
        if not _over_budget("eco_full_infer"):
            try:
                rf = bench_infer("eco_full_kinetics", batch=48, with_cost=True)
                extra["eco_full_infer_videos_per_sec"] = round(rf["videos_per_sec"], 1)
                if "mfu_vs_v5e_bf16_peak" in rf:
                    extra["eco_full_mfu_vs_v5e_bf16_peak"] = round(
                        rf["mfu_vs_v5e_bf16_peak"], 3
                    )
            except Exception as e:
                extra["eco_full_infer_error"] = repr(e)
        if not _over_budget("eco_full_int8"):
            # same-run contrast with the float ECO-Full row above
            # (VERDICT r4 weak #3b: int8 beyond offline ECO-Lite)
            try:
                _note("eco_full int8 bench")
                r8f = bench_int8_infer(
                    "eco_full_kinetics", batch=48, prefix="eco_full_int8"
                )
                extra.update(r8f)
                base_f = extra.get("eco_full_infer_videos_per_sec", 0)
                if base_f:
                    extra["eco_full_int8_speedup_vs_bf16"] = round(
                        r8f["eco_full_int8_videos_per_sec"] / base_f, 2
                    )
            except Exception as e:
                extra["eco_full_int8_error"] = repr(e)
        if not _over_budget("preprocess_kernel_study"):
            try:
                _note("preprocess kernel A/B")
                extra.update(bench_preprocess_kernel())
            except Exception as e:
                extra["preprocess_kernel_error"] = repr(e)
        # round-2 study; its verdict (XLA wins, kernel stays opt-in) is
        # settled and recorded in BENCH_r03/PERF_NOTES, so the ~30s of chip
        # time is now opt-in rather than paid every round (VERDICT r3 #7)
        if os.environ.get("ECO_BENCH_POOL_STUDY", "0") == "1" and \
                not _over_budget("pool_kernel_study"):
            try:
                _note("pool kernel A/B")
                extra.update(bench_pool_kernels())
            except Exception as e:
                extra["pool_kernel_error"] = repr(e)
    _note("done")

    print(
        json.dumps(
            {
                "metric": "eco_lite_16seg_inference_throughput",
                "value": round(best, 1),
                "unit": "videos/s",
                "vs_baseline": round(best / BASELINE_VIDEOS_PER_SEC, 2),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
