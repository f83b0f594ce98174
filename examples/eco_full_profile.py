"""ECO-Full whole-model per-layer profile (VERDICT r5 #5).

The Lite-style device-loop profile (docs/PERF_NOTES.md "Whole-model
per-layer profile") applied to the ECO-Full graph at the bench
configuration (folded inference, bf16, b=48 x 16 segments), to name the
2D-tail outlier -- inception 4a..5b + segment consensus, the part Lite
doesn't have (reference graph
/root/reference/models_ECO_Full/kinetics/ECO_full.prototxt:4776-4881) --
or certify the 0.50 MFU bench row as shape-inherent.

Prints every layer >= 0.2 ms, the grouped stage sums (stem / inception
2D trunk shared with Lite / 2D tail / 3D head / consensus+classifier),
and each group's share of the summed time.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from eco_tpu.convert import optimize_for_inference
from eco_tpu.models import get_model
from eco_tpu.runtime import Program
from eco_tpu.runtime.profiler import format_layer_times, time_layers

BATCH = int(os.environ.get("ECO_PROFILE_BATCH", "48"))
S = 16

t0 = time.time()
graph = get_model("eco_full_kinetics", num_segments=S, batch=BATCH)
prog0 = Program(graph, train=False)
zero = jnp.zeros((BATCH, S, 224, 224, 3), jnp.bfloat16)
params, state = prog0.init(jax.random.PRNGKey(0), {"data": zero})
graph, params, state = optimize_for_inference(graph, params, state)
prog = Program(graph, train=False, compute_dtype=jnp.bfloat16)
print(f"[{time.time()-t0:6.1f}s] init+fold done, {len(prog.exec_layers)} layers")

data = jax.random.uniform(
    jax.random.PRNGKey(1), (BATCH, S, 224, 224, 3), jnp.bfloat16,
    minval=-120, maxval=130,
)
rows = time_layers(prog, params, state, {"data": data},
                   iters=24, repeats=2, method="device_loop")
print(f"[{time.time()-t0:6.1f}s] profile done")
print(format_layer_times([r for r in rows if r[2] >= 0.2]))

# ---- group by model stage ----
# 2D tail = the layers ECO-Full adds beyond Lite's trunk cut: inception
# 4a..5b + its pool/consensus; 3D head = res3a..res5b + global pool.
def stage(name: str) -> str:
    n = name.lower()
    if "global_pool2d" in n:  # the 2D tail's global pool, NOT the 3D head's
        return "2d_tail"
    if any(k in n for k in ("res3", "res4", "res5", "global_pool")):
        return "3d_head"
    if any(k in n for k in ("4a", "4b", "4c", "4d", "4e", "5a", "5b",
                            "pool4", "pool5", "consensus", "segment")):
        return "2d_tail"
    if any(k in n for k in ("fc", "prob", "concat_2d_3d", "dropout")):
        return "classifier"
    if "conv1" in n or "pool1" in n or "conv2" in n or "pool2" in n:
        return "stem"
    return "2d_trunk"

groups: dict = {}
for r in rows:
    groups.setdefault(stage(r[0]), [0.0, 0])
    groups[stage(r[0])][0] += r[2]
    groups[stage(r[0])][1] += 1
total = sum(r[2] for r in rows)
print(f"\n{'stage':12s} {'ms':>9s} {'share':>7s} layers")
for k in ("stem", "2d_trunk", "2d_tail", "3d_head", "classifier"):
    ms, n = groups.get(k, (0.0, 0))
    print(f"{k:12s} {ms:9.3f} {ms/total*100:6.1f}% {n}")
print(f"{'TOTAL':12s} {total:9.3f}")

# whole-model jitted step for contrast (sum-of-isolated is an upper bound)
@jax.jit
def fwd(p, s, d):
    return prog.apply(p, s, {"data": d})[0]["probs"]

out = fwd(params, state, data)
float(jnp.sum(out))
t1 = time.perf_counter()
for _ in range(4):
    float(jnp.sum(fwd(params, state, data)))
whole = (time.perf_counter() - t1) / 4 * 1e3
print(f"\nwhole-model jitted: {whole:.1f} ms  ({BATCH/whole*1e3:.1f} v/s)")
