"""Pipeline parallelism: stage-split serving over a device chain.

The reference has no pipeline parallelism; its model-parallel construct is
the batch-axis Gather/Scatter section (gather_layer.cpp).  The TPU-native
serving analogue is a *stage pipeline*: cut the layer graph at low-traffic
boundaries, pin each stage's params to one device, and stream microbatches
through the chain.  JAX's asynchronous dispatch does the scheduling -- the
Python loop enqueues stage s of microbatch j while stage s-1 of microbatch
j+1 is still executing, so the chain reaches the classic GPipe utilization
M/(M+S-1) with no bespoke scheduler.

This is an inference/serving construct.  For *training* an ECO-sized CNN
(~30-50M params) pipeline stages are the wrong trade on TPU -- the whole
model fits in one chip's HBM, so DP x TP meshes (parallel/{shard,tp}.py)
keep the MXU busier than bubbles ever would; PARITY.md records the
reasoning.

Cut-point selection:

- per-layer cost = a FLOP proxy from one abstract evaluation (output
  elements x fan-in for matmul-bearing layers, output elements otherwise);
- a cut is placed where cumulative cost crosses each stage's equal share,
  nudged to (a) the lowest-byte live set crossing the boundary and (b)
  never separating cross-layer shared-param groups (ECO-Full's sibling
  3c tower, models/bn_inception.py) -- the owner and every aliaser stay in
  one stage so Program.apply's owner resolution keeps working.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp

from eco_tpu.spec.graph import GraphSpec


def _layer_costs(program, shapes: Mapping[str, Any], params) -> list[float]:
    """FLOP proxy per exec layer from blob shapes + param shapes."""
    costs = []
    for layer in program.exec_layers:
        out_elems = sum(
            math.prod(shapes[t].shape) for t in layer.tops if t in shapes
        )
        lp = params.get(layer.name, {})
        w = lp.get("w")
        if w is not None and jnp.ndim(w) >= 2:
            # conv: out_elems x (k... x Cin/g); fc: N x Din x Dout
            costs.append(out_elems * math.prod(jnp.shape(w)[:-1]))
        else:
            costs.append(float(max(out_elems, 1)))
    return costs


def _live_sets(program) -> list[set[str]]:
    """live[i] = blobs produced by layers [0..i] (or graph inputs) that some
    layer >i still reads.  In-place layers re-produce their top, so the LAST
    producer index decides which side of a cut a blob lives on."""
    layers = program.exec_layers
    last_read = {}
    for i, l in enumerate(layers):
        for b in l.bottoms:
            last_read[b] = i
    live = []
    avail = set(program.input_names)
    for i, l in enumerate(layers):
        avail |= set(l.tops)
        live.append({b for b in avail if last_read.get(b, -1) > i})
    return live


def _shared_groups(program) -> list[tuple[int, int]]:
    """(first, last) exec-layer index of each cross-layer shared-param
    group; cuts inside such a span are illegal."""
    spans: dict[str, list[int]] = {}
    for i, l in enumerate(program.exec_layers):
        for ps in l.params:
            if ps.name:
                spans.setdefault(ps.name, []).append(i)
    return [(min(v), max(v)) for v in spans.values() if len(v) > 1]


@dataclass
class Stage:
    """One pipeline stage: a contiguous layer slice as its own Program."""

    program: Any           # executor.Program over the slice
    in_names: list[str]    # blobs this stage consumes from upstream
    out_names: list[str]   # blobs the next stage (or the caller) needs
    layer_names: list[str]


def split_stages(program, sample_inputs: Mapping[str, Any], n_stages: int,
                 params: Optional[Mapping] = None) -> list[Stage]:
    """Cut ``program`` into ``n_stages`` FLOP-balanced contiguous stages.

    ``sample_inputs`` drives one abstract evaluation for the cost model
    (shapes only -- nothing executes).  ``params`` refines matmul costs when
    given.  The returned stages compose exactly: feeding stage s's
    ``out_names`` dict into stage s+1 reproduces ``program.apply``.
    """
    from eco_tpu.runtime.executor import Program

    layers = program.exec_layers
    if n_stages < 1 or n_stages > len(layers):
        raise ValueError(f"n_stages={n_stages} for {len(layers)} layers")

    all_tops = [t for l in layers for t in l.tops]
    abstract_params, state0 = jax.eval_shape(
        lambda rng: program.init(rng, sample_inputs),
        jax.random.PRNGKey(0),
    )
    if params is None:
        params = abstract_params
    # abstract forward for every blob shape
    inputs = {
        k: jax.ShapeDtypeStruct(jnp.shape(v), jnp.result_type(v))
        for k, v in sample_inputs.items()
    }
    outs = jax.eval_shape(
        lambda p, s, x: program.apply(p, s, x, capture=all_tops)[0],
        params, state0, inputs,
    )
    shapes = dict(inputs)
    shapes.update(outs)

    costs = _layer_costs(program, shapes, params)
    live = _live_sets(program)
    groups = _shared_groups(program)
    total = sum(costs)

    def legal(i: int) -> bool:  # cut AFTER layer i
        return not any(a <= i < b for a, b in groups)

    def live_bytes(i: int) -> int:
        return sum(
            math.prod(shapes[b].shape) * shapes[b].dtype.itemsize
            for b in live[i] if b in shapes
        )

    cuts: list[int] = []
    acc = 0.0
    target = total / n_stages
    for i in range(len(layers) - 1):
        acc += costs[i]
        if acc >= target * (len(cuts) + 1) and len(cuts) < n_stages - 1:
            # nudge +-2 layers toward the cheapest legal live set
            cands = [
                j for j in range(max(i - 2, (cuts[-1] if cuts else -1) + 1),
                                 min(i + 3, len(layers) - 1))
                if legal(j)
            ]
            if not cands:
                cands = [j for j in range(
                    (cuts[-1] if cuts else -1) + 1, len(layers) - 1) if legal(j)]
                cands = [j for j in cands if j >= i] or cands
            if not cands:
                # a shared-param span covers everything remaining: stop
                # cutting (fewer stages than asked is legal)
                break
            cuts.append(min(cands, key=live_bytes))
    bounds = [0] + [c + 1 for c in cuts] + [len(layers)]

    stages: list[Stage] = []
    for s in range(len(bounds) - 1):
        lo, hi = bounds[s], bounds[s + 1]
        sl = layers[lo:hi]
        # stage inputs = the FULL live set crossing the boundary (not just
        # blobs this stage consumes): a skip connection produced in stage
        # s-1 and read in stage s+1 must still ride through this stage's
        # input dict so the capture below can forward it.
        if lo == 0:
            in_names = list(program.input_names)
        else:
            in_names = sorted(live[lo - 1])
        out_names = sorted(live[hi - 1]) if hi < len(layers) else list(
            program.output_names
        )
        g = GraphSpec(
            name=f"{program.graph.name}_stage{s}",
            inputs={},
            layers=list(sl),
            options=dict(program.graph.options),
        )
        sp = Program(g, train=program.train,
                     compute_dtype=program.compute_dtype)
        stages.append(Stage(sp, in_names, out_names, [l.name for l in sl]))
    return stages


def make_pp_infer_fn(program, params, state, devices: Sequence,
                     *, sample_inputs: Mapping[str, Any],
                     output: Optional[str] = None,
                     microbatches: int = 4):
    """Build a pipelined inference callable over ``devices`` (one stage per
    device, stage s's params committed to devices[s]).

    Returns ``infer(inputs) -> output array``: splits the leading batch axis
    into ``microbatches`` slices and streams them down the chain; JAX async
    dispatch overlaps stage s of slice j with stage s+1 of slice j-1, and
    inter-stage activations hop devices via ``jax.device_put`` (ICI on a
    real pod).  Numerics are identical to ``program.apply``.
    """
    stages = split_stages(program, sample_inputs, len(devices), params=params)
    n = len(stages)  # may be < len(devices) if shared-param spans limit cuts
    out_name = output or program.output_names[-1]

    placed = []
    for s, st in enumerate(stages):
        p_s = {k: params[k] for k in st.layer_names if k in params}
        s_s = {k: state[k] for k in st.layer_names if k in state}
        placed.append((
            jax.device_put(p_s, devices[s]),
            jax.device_put(s_s, devices[s]),
        ))

    fns = []
    for s, st in enumerate(stages):
        want = st.out_names if s < n - 1 else [out_name]

        def run(p, s_, blobs, _st=st, _want=want):
            outs, _ = _st.program.apply(p, s_, blobs, capture=_want)
            return {k: outs[k] for k in _want}

        fns.append(jax.jit(run))

    def infer(inputs: Mapping[str, Any]):
        batch = next(iter(inputs.values())).shape[0]
        m = min(microbatches, batch)
        splits = [
            {k: v[i * (batch // m):(i + 1) * (batch // m)]
             for k, v in inputs.items()}
            for i in range(m)
        ]
        if batch % m:
            splits.append({k: v[m * (batch // m):] for k, v in inputs.items()})
        outs = []
        for blobs in splits:
            x = jax.device_put(blobs, devices[0])
            for s in range(n):
                p_s, s_s = placed[s]
                x = fns[s](p_s, s_s, x)
                if s < n - 1:
                    x = jax.device_put(x, devices[s + 1])
            outs.append(x[out_name])
        return jnp.concatenate(outs, axis=0)

    return infer
