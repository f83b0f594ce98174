"""Solver family with exact reference-Caffe update semantics.

Reproduces ``SGDSolver/NesterovSolver/AdaGradSolver`` (solver.cpp:620-900)
as one pure jittable update:

1. gradients are *accumulated raw* over ``iter_size`` micro-batches
   (Solver::Step, solver.cpp:195-215) -- here a ``lax.scan`` over a leading
   micro-batch axis;
2. ``ClipGradients`` on the accumulated grads: global L2 over all owned
   params, scale by clip/norm when norm > clip (solver.cpp:636-659);
3. ``Normalize``: grads /= iter_size (solver.cpp:676-700);
4. ``Regularize``: g += weight_decay * decay_mult * w (L2) or * sign(w) (L1)
   (solver.cpp:703-760);
5. update value:
   - SGD:       h' = m*h + local_rate*g;            u = h'
   - Nesterov:  h' = m*h + local_rate*g;            u = (1+m)*h' - m*h
     (solver.cpp:820-870)
   - AdaGrad:   hist' = hist + g^2;  u = local_rate * g / (sqrt(hist') + delta)
6. w -= u  (Net::Update).

``local_rate = lr_policy(iter) * lr_mult`` with per-blob lr_mult/decay_mult
from the graph's ParamSpecs (LayerParameter.param semantics).

The whole step (fwd+bwd over iter_size micro-batches + update) is one XLA
program; under a data mesh it is pjit-sharded and the gradient allreduce that
the reference overlaps by hand on an MPI comm thread (net.cpp:670-702,
channel.cpp) is emitted by XLA's latency-hiding scheduler over ICI.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp

from eco_tpu.spec.graph import GraphSpec, ParamSpec
from eco_tpu.train.lr_policies import learning_rate


@dataclass(frozen=True)
class SolverConfig:
    """Mirror of SolverParameter (caffe.proto:103-214), TPU-relevant subset."""

    base_lr: float = 0.001
    lr_policy: str = "step"
    gamma: float = 0.1
    stepsize: int = 24000
    stepvalues: tuple[int, ...] = ()
    power: float = 1.0
    max_iter: int = 60000
    momentum: float = 0.9
    weight_decay: float = 0.0005
    regularization_type: str = "L2"
    clip_gradients: float = -1.0
    iter_size: int = 1
    solver_type: str = "nesterov"  # sgd | nesterov | adagrad
    delta: float = 1e-8  # adagrad
    # bookkeeping (host-side)
    display: int = 20
    average_loss: int = 1
    snapshot: int = 1000
    snapshot_prefix: str = "snapshots/eco"
    test_iter: int = 0
    test_interval: int = 0
    random_seed: int = 0


@jax.tree_util.register_pytree_node_class
@dataclass
class TrainState:
    params: Any
    state: Any  # BN running stats
    history: Any  # momentum / adagrad accumulator, same structure as params
    it: jnp.ndarray  # int32 iteration counter

    def tree_flatten(self):
        return (self.params, self.state, self.history, self.it), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


# Caffe blob positions for our param names (LayerParameter.param ordering:
# weights/slope first, bias second).  Dict iteration order is NOT used --
# pytree flatten/unflatten sorts dict keys, so positions must be canonical.
_PARAM_POS = {"w": 0, "gamma": 0, "scale": 0, "b": 1, "beta": 1, "shift": 1}


def param_multipliers(graph: GraphSpec, params) -> tuple[Any, Any]:
    """Per-blob (lr_mult, decay_mult) trees from the graph's ParamSpecs."""
    lr, decay = {}, {}
    for lname, lp in params.items():
        spec = graph.layer(lname)
        lr[lname], decay[lname] = {}, {}
        for i, pname in enumerate(lp):
            pos = _PARAM_POS.get(pname, i)
            m = spec.params[pos] if pos < len(spec.params) else ParamSpec()
            lr[lname][pname] = m.lr_mult
            decay[lname][pname] = m.decay_mult
    return lr, decay


def init_train_state(params, state) -> TrainState:
    history = jax.tree.map(jnp.zeros_like, params)
    return TrainState(params, state, history, jnp.zeros((), jnp.int32))


def make_train_step(program, cfg: SolverConfig, *, remat: Optional[str] = None):
    """Returns ``step(ts, batch, rng) -> (ts, metrics)``.

    ``batch`` values must carry a leading micro-batch axis of length
    ``cfg.iter_size`` (use ``iter_size=1`` batches of shape [1, ...] if no
    accumulation).  The function is pure -- jit/pjit it at the call site.
    ``remat``: rematerialization policy (eco_tpu.runtime.memory) -- the
    ``mem_param`` activation-memory-optimizer equivalent.
    """
    if remat is not None:
        from eco_tpu.runtime.memory import apply_with_remat

        apply_fn = apply_with_remat(program, remat)
    else:
        def apply_fn(p, s, m, rng=None):
            return program.apply(p, s, m, rng=rng)

    def loss_fn(params, state, micro, rng):
        outs, new_state = apply_fn(params, state, micro, rng=rng)
        return program.total_loss(outs), (new_state, outs)

    grad_fn = jax.grad(loss_fn, has_aux=True)

    def step(ts: TrainState, batch: Mapping[str, Any], rng: jax.Array):
        lr_tree, decay_tree = param_multipliers(program.graph, ts.params)

        def micro_step(carry, inp):
            accum, state = carry
            micro, sub_rng = inp
            grads, (new_state, outs) = grad_fn(ts.params, state, micro, sub_rng)
            accum = jax.tree.map(jnp.add, accum, grads)
            return (accum, new_state), program.total_loss(outs)

        zeros = jax.tree.map(jnp.zeros_like, ts.params)
        rngs = jax.random.split(rng, cfg.iter_size)
        (gsum, new_state), losses = jax.lax.scan(
            micro_step, (zeros, ts.state), (batch, rngs)
        )

        # 2. global-norm clip on ACCUMULATED grads (solver.cpp:636-659)
        if cfg.clip_gradients > 0:
            gnorm = jnp.sqrt(
                sum(
                    jnp.sum(jnp.square(g.astype(jnp.float32)))
                    for g in jax.tree.leaves(gsum)
                )
            )
            scale = jnp.where(
                gnorm > cfg.clip_gradients, cfg.clip_gradients / gnorm, 1.0
            )
            gsum = jax.tree.map(lambda g: g * scale, gsum)
        else:
            gnorm = jnp.zeros(())

        rate = learning_rate(cfg, ts.it)

        def update_one(w, g, h, lm, dm):
            g = g.astype(jnp.float32) / cfg.iter_size  # 3. Normalize
            wd = cfg.weight_decay * dm
            if cfg.regularization_type.upper() == "L1":
                g = g + wd * jnp.sign(w)
            else:
                g = g + wd * w  # 4. Regularize (L2)
            local_rate = rate * lm
            st = cfg.solver_type.lower()
            if st == "adagrad":
                h_new = h + jnp.square(g)
                u = local_rate * g / (jnp.sqrt(h_new) + cfg.delta)
            elif st == "nesterov":
                h_new = cfg.momentum * h + local_rate * g
                u = (1.0 + cfg.momentum) * h_new - cfg.momentum * h
            elif st == "sgd":
                h_new = cfg.momentum * h + local_rate * g
                u = h_new
            else:
                raise ValueError(f"unknown solver_type {cfg.solver_type!r}")
            return w - u, h_new

        new_params, new_history = {}, {}
        for lname, lp in ts.params.items():
            new_params[lname], new_history[lname] = {}, {}
            for pname, w in lp.items():
                nw, nh = update_one(
                    w,
                    gsum[lname][pname],
                    ts.history[lname][pname],
                    lr_tree[lname][pname],
                    decay_tree[lname][pname],
                )
                new_params[lname][pname] = nw
                new_history[lname][pname] = nh

        metrics = {
            "loss": jnp.mean(losses),
            "lr": rate,
            "grad_norm": gnorm,
        }
        return TrainState(new_params, new_state, new_history, ts.it + 1), metrics

    return step


def make_eval_step(program):
    """Test-phase forward collecting the graph's metric tops
    (Solver::Test, solver.cpp:450-518)."""

    def eval_step(params, state, batch):
        outs, _ = program.apply(params, state, batch)
        return {
            k: v for k, v in outs.items() if jnp.ndim(v) == 0
        }

    return eval_step
