"""Activation-memory policies -- the TPU answer to Net::MemoryOptimize_v2.

The reference reduces training memory by aliasing activation buffers into
shared "slots" via a dry-run refcount simulation (net.cpp:980-1277, enabled
by ``mem_param`` in the prototxt).  Under XLA, buffer liveness/aliasing is
already optimal at the whole-program level, so the remaining lever is
*rematerialization*: trade FLOPs for memory by recomputing activations in
the backward pass (``jax.checkpoint``).

``apply_with_remat`` wraps a Program's apply under a remat policy; the
prototxt importer maps ``mem_param { optimize_train: true }`` to the
``dots_saveable`` policy (keep conv/matmul outputs, recompute elementwise) --
the closest analogue of what the slot optimizer achieves.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.ad_checkpoint import checkpoint_policies as cp

POLICIES = {
    # recompute everything (max memory saving, ~2x fwd FLOPs in bwd)
    "nothing": cp.nothing_saveable,
    # keep MXU results, recompute VPU elementwise chains (default)
    "dots": cp.dots_saveable,
    # keep everything (no remat)
    "everything": cp.everything_saveable,
}


def apply_with_remat(program, policy: Optional[str] = "dots"):
    """Returns an apply(params, state, inputs, rng) with remat applied.

    Use in place of ``program.apply`` inside a grad/train step.
    """
    if policy is None or policy == "everything":
        return program.apply

    chk = jax.checkpoint(
        lambda params, state, inputs, rng: program.apply(
            params, state, inputs, rng=rng
        ),
        policy=POLICIES[policy],
    )

    def apply(params, state, inputs, *, rng=None, capture=None):
        assert capture is None, "capture not supported under remat"
        return chk(params, state, inputs, rng)

    return apply


def remat_policy_from_graph(graph) -> Optional[str]:
    """mem_param mapping: optimize_train -> 'dots', absent -> None."""
    mp = getattr(graph, "options", {}).get("mem_param") if hasattr(graph, "options") else None
    if mp and mp.get("optimize_train"):
        return "dots"
    return None
