"""Sharded training / inference steps over a device mesh.

The reference's entire distributed machinery -- background MPI comm thread
(channel.cpp), overlapped per-layer gradient allreduce (net.cpp:670-702),
1/world gradient rescale + output/loss averaging (solver.cpp:310-392), and
cursor-offset data sharding (base_data_layer.cpp:42-45) -- collapses here
into GSPMD: the batch is sharded over the ``data`` mesh axis, parameters are
replicated, and XLA inserts + overlaps the gradient reduce-scatter/allreduce
itself.  Training-mode BN under pjit computes moments over the *global*
batch, i.e. the reference's SyncBN (sync_bn_layer.cu) semantics for free.

``segment`` sharding: for few-video/many-segment workloads the 2D trunk is
batch-parallel in (video x segment); sharding the fused (N*S) axis over the
mesh and resharding to segment-major for the 3D head rides ICI exactly like
the reference's Gather "model-parallel section" (gather_layer.cpp).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Mapping

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eco_tpu.parallel.mesh import DATA_AXIS, batch_sharding, replicated
from eco_tpu.train.solver import SolverConfig, TrainState, make_train_step


def shard_batch(mesh: Mesh, batch: Mapping[str, Any], *, batch_axis: int = 0):
    """Place host batch arrays sharded along the data mesh axis."""
    sh = batch_sharding(mesh, batch_axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def make_sharded_train_step(program, cfg: SolverConfig, mesh: Mesh,
                            *, remat=None):
    """pjit'd train step: params/opt-state replicated, batch data-sharded.

    Batch layout: {name: (iter_size, N, ...)} with N sharded over ``data``.
    ``remat``: rematerialization policy name (eco_tpu.runtime.memory).
    """
    step = make_train_step(program, cfg, remat=remat)
    rep = replicated(mesh)
    batch_sh = NamedSharding(mesh, P(None, DATA_AXIS))

    @partial(jax.jit, donate_argnums=(0,))
    def sharded_step(ts: TrainState, batch, rng):
        batch = {
            k: jax.lax.with_sharding_constraint(v, batch_sh)
            for k, v in batch.items()
        }
        ts = jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, rep), ts)
        new_ts, metrics = step(ts, batch, rng)
        return new_ts, metrics

    return sharded_step


def make_segment_sharded_train_step(program, cfg: SolverConfig, mesh: Mesh,
                                    *, remat=None):
    """Sequence-parallel training: batch AND segment axes sharded.

    For long-clip fine-tunes (many segments, few videos per chip) the
    (iter_size, N, S, ...) data blob shards over ``data`` x ``segment``;
    the 3D head's temporal convs run spatially partitioned with GSPMD halo
    exchanges in BOTH the forward and backward pass, while label-shaped
    blobs (rank < 4) shard over ``data`` only.  Params/momentum stay
    replicated; numerics are identical to the single-device step.
    """
    from eco_tpu.parallel.mesh import SEGMENT_AXIS

    step = make_train_step(program, cfg, remat=remat)
    rep = replicated(mesh)
    seq_sh = NamedSharding(mesh, P(None, DATA_AXIS, SEGMENT_AXIS))
    vec_sh = NamedSharding(mesh, P(None, DATA_AXIS))

    @partial(jax.jit, donate_argnums=(0,))
    def sharded_step(ts: TrainState, batch, rng):
        batch = {
            k: jax.lax.with_sharding_constraint(
                v, seq_sh if v.ndim >= 4 else vec_sh
            )
            for k, v in batch.items()
        }
        ts = jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, rep), ts)
        return step(ts, batch, rng)

    return sharded_step


def make_segment_sharded_infer_fn(program, mesh: Mesh, *, output: str = "probs"):
    """Inference with BOTH the video and segment axes sharded.

    The long-sequence play (SURVEY.md section 5): for few videos with many
    segments, the 2D trunk's fused (video x segment) batch axis is sharded
    over ``data`` x ``segment``, and the 3D head's temporal convolutions run
    spatially partitioned over the ``segment`` axis -- GSPMD inserts the
    halo exchanges over ICI that the reference's Gather sections emulated by
    full allgathers (gather_layer.cpp).
    """
    from eco_tpu.parallel.mesh import SEGMENT_AXIS

    in_sh = NamedSharding(mesh, P(DATA_AXIS, SEGMENT_AXIS))

    @jax.jit
    def infer(params, state, data):
        data = jax.lax.with_sharding_constraint(data, in_sh)
        outs, _ = program.apply(params, state, {"data": data})
        return jax.lax.with_sharding_constraint(
            outs[output], NamedSharding(mesh, P(DATA_AXIS))
        )

    return infer


def make_sharded_infer_fn(program, mesh: Mesh, *, output: str = "probs"):
    """Batched multi-video inference with videos sharded over the mesh."""
    data_sh = NamedSharding(mesh, P(DATA_AXIS))

    @jax.jit
    def infer(params, state, data):
        data = jax.lax.with_sharding_constraint(data, data_sh)
        outs, _ = program.apply(params, state, {"data": data})
        return outs[output]

    return infer
