"""Localize ECO-Full's whole-model vs sum-of-isolated-layers gap (1.61x at
b=48: 56.9 ms whole vs 35.4 ms summed) by timing jitted PREFIX programs
built from dependency closures:

  stem   = ancestors(pool2_3x3_s2)
  trunk  = ancestors(global_pool) & ancestors(pool_fusion_st2D)  (shared 2D)
  +head  = trunk | ancestors(global_pool)        (adds the 3D-ResNet head)
  +tail  = trunk | ancestors(pool_fusion_st2D)   (adds inception 4a..5b)
  full   = everything (classifier concat + fc + softmax)

Differences between consecutive prefixes give each stage's cost inside the
real compiled program (fusions, layouts, concat copies included), which
isolated per-layer timing cannot see."""
import dataclasses
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax
import jax.numpy as jnp

import bench
from eco_tpu.convert import optimize_for_inference
from eco_tpu.models import get_model
from eco_tpu.runtime import Program

B, S = 48, 16
t0 = time.time()
graph = get_model("eco_full_kinetics", num_segments=S, batch=B)
prog0 = Program(graph, train=False)
zero = jnp.zeros((B, S, 224, 224, 3), jnp.bfloat16)
params, state = prog0.init(jax.random.PRNGKey(0), {"data": zero})
graph, params, state = optimize_for_inference(graph, params, state)
print(f"[{time.time()-t0:5.1f}s] folded, {len(graph.layers)} layers",
      flush=True)

producer = {}
for i, l in enumerate(graph.layers):
    for t in l.tops:
        producer[t] = i  # last producer wins (in-place chains)


def ancestors(blob: str) -> set:
    seen, todo = set(), [blob]
    while todo:
        b = todo.pop()
        if b not in producer:
            continue
        i = producer[b]
        # include every earlier producer of in-place tops too
        for j, l in enumerate(graph.layers[: i + 1]):
            if any(t in l.tops for t in graph.layers[i].tops) or j == i:
                if j not in seen:
                    seen.add(j)
                    todo.extend(graph.layers[j].bottoms)
    return seen


head_anc = ancestors("global_pool")
tail_anc = ancestors("pool_fusion_st2D")
stem = ancestors("pool2_3x3_s2")
trunk = head_anc & tail_anc
SUBSETS = [
    ("stem", stem),
    ("trunk", trunk),
    ("+3d_head", trunk | head_anc),
    ("+2d_tail", trunk | tail_anc),
    ("full", set(range(len(graph.layers)))),
]
for lbl, idx in SUBSETS:
    print(f"{lbl:10s} {len(idx)} layers", flush=True)

data = [
    jax.block_until_ready(jax.random.uniform(
        jax.random.PRNGKey(i), (B, S, 224, 224, 3), jnp.bfloat16,
        minval=-120, maxval=130))
    for i in range(2)
]

rows = []
for label, idxset in SUBSETS:
    kept = [graph.layers[i] for i in sorted(idxset)]
    names = {l.name for l in kept}
    sub = dataclasses.replace(graph, layers=kept)
    prog = Program(sub, train=False, compute_dtype=jnp.bfloat16)
    p = {k: v for k, v in params.items() if k in names}
    s = {k: v for k, v in state.items() if k in names}

    def fwd(pp, ss, d, _prog=prog):
        outs, _ = _prog.apply(pp, ss, {"data": d})
        return sum(jnp.sum(v.astype(jnp.float32)) for v in outs.values())

    compiled = jax.jit(fwd).lower(p, s, data[0]).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    dt = bench._pipelined_time(lambda d: compiled(p, s, d),
                               [(v,) for v in data], iters=12)
    ms = dt * 1e3
    rows.append((label, ms, flops))
    print(f"[{time.time()-t0:5.1f}s] {label:10s} {ms:7.2f} ms  "
          f"{flops/1e9:8.1f} GF  {flops/dt/1e12:6.1f} TF/s", flush=True)

print()
d = {lbl: (ms, fl) for lbl, ms, fl in rows}
trunk_ms, trunk_fl = d["trunk"]
for lbl in ("+3d_head", "+2d_tail"):
    ms, fl = d[lbl]
    dms, dfl = ms - trunk_ms, fl - trunk_fl
    print(f"{lbl[1:]:10s} in-program: {dms:6.2f} ms  {dfl/1e9:8.1f} GF  "
          f"{dfl/max(dms,1e-9)*1e-9:6.1f} TF/s")
full_ms, full_fl = d["full"]
both = (d["+3d_head"][0] - trunk_ms) + (d["+2d_tail"][0] - trunk_ms)
print(f"full - trunk: {full_ms-trunk_ms:6.2f} ms vs head+tail deltas "
      f"{both:6.2f} ms (classifier + output-sum residue)")
print("STAGEWISE-OK")
