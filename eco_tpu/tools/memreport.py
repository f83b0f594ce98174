"""Compiled-memory report: the mem_param / MemoryOptimize_v2 evidence tool.

The reference's activation-memory optimizer (net.cpp:1080-1277, enabled by
``mem_param { optimize_train: true }``) reduced training activation memory by
slot-sharing buffers.  Our equivalent is rematerialization
(eco_tpu.runtime.memory); this tool compiles the ECO-Lite training step with
and without each remat policy and prints XLA's memory analysis so the win is
measurable on the actual backend:

    python -m eco_tpu.tools.memreport [--batch 16 --segments 16 --crop 224]

Prints one JSON line per policy with temp/argument/output bytes.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def report(batch=16, segments=16, crop=224, num_classes=400, policies=(None, "dots", "nothing")):
    import jax
    import jax.numpy as jnp

    from eco_tpu.models import build_eco_lite
    from eco_tpu.runtime import Program
    from eco_tpu.train.solver import SolverConfig, init_train_state, make_train_step

    g = build_eco_lite(
        num_classes=num_classes, num_segments=segments, crop_size=crop,
        with_loss=True, batch=batch,
    )
    prog = Program(g, train=True)
    cfg = SolverConfig(iter_size=1, solver_type="nesterov", clip_gradients=40.0)
    rng = np.random.default_rng(0)
    data = jnp.asarray(
        rng.standard_normal((1, batch, segments, crop, crop, 3)), jnp.bfloat16
    )
    label = jnp.asarray(rng.integers(0, num_classes, (1, batch)))
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data[0], "label": label[0]})
    ts = init_train_state(params, state)
    key = jax.random.PRNGKey(1)
    rows = []
    for pol in policies:
        compiled = (
            jax.jit(make_train_step(prog, cfg, remat=pol))
            .lower(ts, {"data": data, "label": label}, key)
            .compile()
        )
        ma = compiled.memory_analysis()
        row = {
            "policy": pol or "none",
            "temp_bytes": getattr(ma, "temp_size_in_bytes", None),
            "argument_bytes": getattr(ma, "argument_size_in_bytes", None),
            "output_bytes": getattr(ma, "output_size_in_bytes", None),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--segments", type=int, default=16)
    p.add_argument("--crop", type=int, default=224)
    p.add_argument("--classes", type=int, default=400)
    args = p.parse_args(argv)
    report(args.batch, args.segments, args.crop, args.classes)


if __name__ == "__main__":
    main()
