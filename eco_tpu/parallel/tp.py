"""Tensor (model) parallelism: channel-sharded params over the ``model`` axis.

The reference has no true tensor parallelism -- its closest construct is the
Gather/Scatter "model-parallel section" (gather_layer.cpp) which regroups
the batch axis so a section of the net can run on fewer ranks.  The
TPU-native construct is GSPMD: annotate each weight's output-channel dim
with the ``model`` mesh axis, let XLA propagate the sharding through the
graph and insert the allgather/psum collectives over ICI.  Numerics are
unchanged (GSPMD partitioning is semantics-preserving); the win is
per-device weight + optimizer-state memory (O(1/tp)) and MXU parallelism on
wide layers, and it composes orthogonally with the ``data`` axis (DP x TP
meshes).

Sharding rule (layouts from runtime/executor.py param_specs):

- conv ``w`` is (*k, Cin/g, Cout) and inner-product ``w`` is (Din, Dout):
  shard the LAST dim (output channels) when divisible by the tp size;
- 1-D per-channel vectors (bias, BN gamma/beta and running mean/var, PReLU
  slope, Scale scale/shift) shard dim 0 when divisible;
- everything else (scalars, ragged dims) replicates.

GSPMD reshards wherever consecutive layers disagree, so the rule is safe
for every layer type in the registry, including grouped/depthwise convs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eco_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from eco_tpu.train.solver import SolverConfig, TrainState, make_train_step


def _leaf_spec(shape, tp: int) -> P:
    if len(shape) >= 2 and shape[-1] % tp == 0 and shape[-1] >= tp:
        return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
    if len(shape) == 1 and shape[0] >= tp and shape[0] % tp == 0:
        return P(MODEL_AXIS)
    return P()


def tp_spec_tree(tree, mesh: Mesh, *, axis: str = MODEL_AXIS):
    """PartitionSpec tree mirroring ``tree`` under the channel-sharding rule."""
    tp = int(mesh.shape[axis])
    return jax.tree.map(lambda a: _leaf_spec(jnp.shape(a), tp), tree)


def shard_tp_tree(mesh: Mesh, tree, *, axis: str = MODEL_AXIS):
    """device_put every leaf to its tp sharding (committed placement)."""
    specs = tp_spec_tree(tree, mesh, axis=axis)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), tree, specs
    )


def shard_tp_train_state(mesh: Mesh, ts: TrainState, *, axis: str = MODEL_AXIS):
    """Shard a TrainState: params/history/state channel-sharded, it replicated."""
    return TrainState(
        shard_tp_tree(mesh, ts.params, axis=axis),
        shard_tp_tree(mesh, ts.state, axis=axis),
        shard_tp_tree(mesh, ts.history, axis=axis),
        jax.device_put(ts.it, NamedSharding(mesh, P())),
    )


def _constrain(tree, mesh: Mesh, axis: str):
    specs = tp_spec_tree(tree, mesh, axis=axis)
    return jax.tree.map(
        lambda a, s: jax.lax.with_sharding_constraint(a, NamedSharding(mesh, s)),
        tree, specs,
    )


def make_tp_infer_fn(program, mesh: Mesh, *, output: str = "probs",
                     axis: str = MODEL_AXIS):
    """jit'd inference with weights channel-sharded over ``model`` (and the
    batch over ``data`` when the mesh has that axis).

    Pass params/state through :func:`shard_tp_tree` first so the arrays are
    COMMITTED to their shards (per-device memory actually drops); the
    in-graph constraints below then only re-assert what placement already
    says.
    """
    has_data = DATA_AXIS in mesh.shape
    data_sh = NamedSharding(mesh, P(DATA_AXIS) if has_data else P())

    @jax.jit
    def infer(params, state, data):
        params = _constrain(params, mesh, axis)
        state = _constrain(state, mesh, axis)
        data = jax.lax.with_sharding_constraint(data, data_sh)
        outs, _ = program.apply(params, state, {"data": data})
        return jax.lax.with_sharding_constraint(
            outs[output], NamedSharding(mesh, P(DATA_AXIS) if has_data else P())
        )

    return infer


def make_tp_train_step(program, cfg: SolverConfig, mesh: Mesh, *,
                       remat=None, axis: str = MODEL_AXIS):
    """pjit'd train step over a DP x TP mesh.

    Batch layout {name: (iter_size, N, ...)} with N sharded over ``data``
    (replicated if the mesh has no data axis); params, momentum history and
    BN state are channel-sharded over ``model`` so weight grads and the
    optimizer update run sharded too -- the update math in
    train/solver.py is elementwise over the param tree, so GSPMD keeps it
    fully local to each shard.
    """
    step = make_train_step(program, cfg, remat=remat)
    has_data = DATA_AXIS in mesh.shape
    batch_sh = NamedSharding(mesh, P(None, DATA_AXIS) if has_data else P())

    @partial(jax.jit, donate_argnums=(0,))
    def tp_step(ts: TrainState, batch, rng):
        batch = {
            k: jax.lax.with_sharding_constraint(v, batch_sh)
            for k, v in batch.items()
        }
        ts = TrainState(
            _constrain(ts.params, mesh, axis),
            _constrain(ts.state, mesh, axis),
            _constrain(ts.history, mesh, axis),
            jax.lax.with_sharding_constraint(ts.it, NamedSharding(mesh, P())),
        )
        new_ts, metrics = step(ts, batch, rng)
        new_ts = TrainState(
            _constrain(new_ts.params, mesh, axis),
            _constrain(new_ts.state, mesh, axis),
            _constrain(new_ts.history, mesh, axis),
            jax.lax.with_sharding_constraint(new_ts.it, NamedSharding(mesh, P())),
        )
        return new_ts, metrics

    return tp_step
