"""Learning-rate policies with exact reference semantics
(SGDSolver::GetLearningRate, solver.cpp:580-619), incl. the fork's ``exp10``.

Implemented as jnp expressions of the iteration so the whole schedule lives
inside the jitted train step (no host round-trip per step).
"""

from __future__ import annotations

import jax.numpy as jnp


def learning_rate(cfg, it):
    """cfg: SolverConfig-like; it: int or traced int32 iteration."""
    it = jnp.asarray(it, jnp.float32)
    base = cfg.base_lr
    policy = cfg.lr_policy
    if policy == "fixed":
        return jnp.full((), base, jnp.float32)
    if policy == "step":
        return base * jnp.power(cfg.gamma, jnp.floor(it / cfg.stepsize))
    if policy == "exp":
        return base * jnp.power(cfg.gamma, it)
    if policy == "inv":
        return base * jnp.power(1.0 + cfg.gamma * it, -cfg.power)
    if policy == "multistep":
        # current_step = #stepvalues passed (solver.cpp:595-602)
        steps = jnp.asarray(cfg.stepvalues, jnp.float32)
        current = jnp.sum((it >= steps).astype(jnp.float32))
        return base * jnp.power(cfg.gamma, current)
    if policy == "poly":
        return base * jnp.power(1.0 - it / cfg.max_iter, cfg.power)
    if policy == "sigmoid":
        return base * (1.0 / (1.0 + jnp.exp(-cfg.gamma * (it - cfg.stepsize))))
    if policy == "exp10":
        return base * jnp.power(10.0, -it / cfg.stepsize)
    raise ValueError(f"unknown lr_policy {policy!r}")
