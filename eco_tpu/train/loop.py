"""Host-side training driver -- Solver::Solve/Step/TestAll parity
(solver.cpp:168-518) over the jitted train step.

Features mirrored: ``iter_size`` micro-batching (delegated to the step),
smoothed-loss window (``average_loss``, solver.cpp:230-239), display
interval with lr reporting, periodic test passes running ``test_iter``
batches and averaging metric tops (solver.cpp:450-518), snapshot interval +
final snapshot, resume from a solverstate, and multi-artifact transfer init.
"""

from __future__ import annotations

import collections
import time
from dataclasses import dataclass
from typing import Callable, Iterable, Iterator, Mapping, Optional

import numpy as np
import jax

from eco_tpu.train.checkpoint import restore, snapshot
from eco_tpu.train.solver import (
    SolverConfig,
    TrainState,
    init_train_state,
    make_eval_step,
    make_train_step,
)


def solver_config_from_prototxt(text: str) -> SolverConfig:
    """Parse a solver.prototxt into SolverConfig (SolverParameter subset)."""
    from eco_tpu.spec.prototxt import parse_prototxt

    d = parse_prototxt(text)
    typ = str(d.get("solver_type", "SGD")).lower()
    stepvalues = d.get("stepvalue", ())
    if not isinstance(stepvalues, (list, tuple)):
        stepvalues = (stepvalues,)
    return SolverConfig(
        base_lr=float(d.get("base_lr", 0.01)),
        lr_policy=str(d.get("lr_policy", "fixed")),
        gamma=float(d.get("gamma", 0.1)),
        stepsize=int(d.get("stepsize", 100000)),
        stepvalues=tuple(int(s) for s in stepvalues),
        power=float(d.get("power", 1.0)),
        max_iter=int(d.get("max_iter", 10000)),
        # SolverParameter's momentum default is 0 (caffe.proto); ECO's shipped
        # solvers all set it explicitly.
        momentum=float(d.get("momentum", 0.0)),
        weight_decay=float(d.get("weight_decay", 0.0)),
        regularization_type=str(d.get("regularization_type", "L2")),
        clip_gradients=float(d.get("clip_gradients", -1)),
        iter_size=int(d.get("iter_size", 1)),
        solver_type=typ,
        display=int(d.get("display", 0)),
        average_loss=int(d.get("average_loss", 1)),
        snapshot=int(d.get("snapshot", 0)),
        snapshot_prefix=str(d.get("snapshot_prefix", "snapshots/eco")),
        test_iter=int(d.get("test_iter", 0)),
        test_interval=int(d.get("test_interval", 0)),
        random_seed=int(d.get("random_seed", 0)),
    )


class Trainer:
    """Drives train/test programs against data iterators.

    ``train_iter`` must yield {"data": (iter_size, N, ...), "label":
    (iter_size, N)} micro-batched arrays; ``test_iter_fn`` returns a fresh
    iterator of {"data": (N, ...), "label": (N,)} eval batches.
    """

    def __init__(
        self,
        train_program,
        cfg: SolverConfig,
        *,
        test_program=None,
        step_fn: Optional[Callable] = None,
        log_fn: Callable[[str], None] = print,
        remat: Optional[str] = "auto",
        process_index: Optional[int] = None,
        mesh=None,
        metrics_lag: int = 0,
    ):
        self.cfg = cfg
        self.train_program = train_program
        self.test_program = test_program
        # injectable rank for snapshot gating (None = jax.process_index());
        # lets multi-host host-side logic be unit-driven on one host
        self.process_index = process_index
        if remat == "auto":
            # mem_param { optimize_train: true } in the graph -> remat
            # (the reference's activation-memory optimizer, net.cpp:1080-1277)
            from eco_tpu.runtime.memory import remat_policy_from_graph

            remat = remat_policy_from_graph(train_program.graph)
        self.remat = remat
        if step_fn is None and mesh is not None:
            from eco_tpu.parallel.mesh import MODEL_AXIS

            if MODEL_AXIS in mesh.shape:
                # DP x TP: weights/momentum channel-sharded over ``model``,
                # batch over ``data`` (eco_tpu.parallel.tp); pass a
                # shard_tp_train_state'd TrainState for committed placement
                from eco_tpu.parallel.tp import make_tp_train_step

                step_fn = make_tp_train_step(
                    train_program, cfg, mesh, remat=remat
                )
            else:
                # data-parallel over the mesh: pjit shards the batch axis,
                # replicates params, and emits/overlaps the gradient
                # allreduce (the reference's whole MPI engine,
                # channel.cpp/net.cpp:670-702)
                from eco_tpu.parallel.shard import make_sharded_train_step

                step_fn = make_sharded_train_step(
                    train_program, cfg, mesh, remat=remat
                )
        self.step = step_fn or jax.jit(
            make_train_step(train_program, cfg, remat=remat)
        )
        self.eval_step = None
        if test_program is not None:
            ev = make_eval_step(test_program)
            if mesh is not None:
                # batch-sharded eval: in-graph metric tops (accuracy/loss)
                # reduce over the GLOBAL batch, i.e. the reference's
                # SyncOutput/SyncLoss allreduce-means (solver.cpp:372-392)
                from jax.sharding import NamedSharding, PartitionSpec

                from eco_tpu.parallel.mesh import DATA_AXIS

                bspec = (
                    PartitionSpec(DATA_AXIS)
                    if DATA_AXIS in mesh.shape else PartitionSpec()
                )
                bsh = NamedSharding(mesh, bspec)

                def ev_sharded(params, state, batch, _ev=ev, _bsh=bsh):
                    batch = {
                        k: jax.lax.with_sharding_constraint(v, _bsh)
                        for k, v in batch.items()
                    }
                    return _ev(params, state, batch)

                ev = ev_sharded
            self.eval_step = jax.jit(ev)
        self.log = log_fn
        if metrics_lag not in (0, 1):
            raise ValueError(f"metrics_lag must be 0 or 1, got {metrics_lag}")
        # metrics_lag=1 defers the host read of step i's metrics until step
        # i+1 has been DISPATCHED, so the host never blocks between steps:
        # JAX's async dispatch runs step i on-chip while Python decodes and
        # device_puts batch i+1 (pair with data.prefetch_to_device for the
        # full overlap).  Cost: loss display / non-finite detection lag one
        # iteration, and the last-good snapshot on divergence is unavailable
        # (the pre-divergence TrainState was already donated to the next
        # step).  Hooks receive the LATEST TrainState (one step ahead of the
        # metrics they accompany).
        self.metrics_lag = metrics_lag
        self.loss_window: collections.deque = collections.deque(
            maxlen=max(1, cfg.average_loss)
        )

    def init_state(self, sample_micro: Mapping, seed: int = 0) -> TrainState:
        params, state = self.train_program.init(
            jax.random.PRNGKey(seed), sample_micro
        )
        return init_train_state(params, state)

    def solve(
        self,
        ts: TrainState,
        train_iter: Iterator,
        *,
        test_iter_fn: Optional[Callable[[], Iterable]] = None,
        resume_from: Optional[str] = None,
        hooks: Iterable[Callable] = (),
    ) -> TrainState:
        """Run the training loop.

        ``hooks``: callables ``hook(it, ts, metrics)`` invoked once per
        consumed step.  ``it`` and ``metrics`` always belong to the same
        step; under ``metrics_lag=1`` (the ``eco train`` default) ``ts`` is
        the TrainState one step AHEAD of them -- hooks that snapshot or log
        state keyed by iteration must key on ``it``, not ``int(ts.it)``.
        With ``metrics_lag=0`` all three are step-consistent.
        """
        cfg = self.cfg
        if resume_from:
            ts = restore(resume_from, ts)
            self.log(f"Resumed from {resume_from} at iter {int(ts.it)}")
        rng = jax.random.PRNGKey(cfg.random_seed)
        self._t_last = time.perf_counter()
        # host-side iteration counter: the step increments ts.it by exactly
        # 1, so mirroring it here avoids a device sync per loop (int(ts.it)
        # blocks on the whole step under async dispatch)
        it = int(ts.it)
        pending = None  # (it, metrics) not yet read back (metrics_lag=1)
        while it < cfg.max_iter:
            if (
                cfg.test_interval
                and it > 0
                and it % cfg.test_interval == 0
                and test_iter_fn is not None
                and self.eval_step is not None
            ):
                self.test(ts, test_iter_fn())
            batch = next(train_iter)
            rng, sub = jax.random.split(rng)
            prev_ts = ts
            ts, metrics = self.step(ts, batch, sub)
            it += 1
            if self.metrics_lag:
                if pending is not None:
                    self._consume_metrics(pending[0], pending[1], ts, None, hooks)
                pending = (it - 1, metrics)
            else:
                self._consume_metrics(it - 1, metrics, ts, prev_ts, hooks)
            if cfg.snapshot and it % cfg.snapshot == 0:
                # flush the lagged metrics BEFORE writing: the non-finite
                # guard in _consume_metrics must precede any snapshot write,
                # or a NaN loss at a snapshot boundary would persist poisoned
                # weights that a later resume silently restores
                if pending is not None:
                    self._consume_metrics(pending[0], pending[1], ts, None, hooks)
                    pending = None
                self._snapshot(ts)
        if pending is not None:
            self._consume_metrics(pending[0], pending[1], ts, None, hooks)
        if cfg.snapshot and it % cfg.snapshot != 0:
            self._snapshot(ts)
        return ts

    def _consume_metrics(self, it, metrics, ts, prev_ts, hooks):
        """Host-side read of one step's metrics: failure detection, loss
        window, hooks, display.  ``it`` is the pre-step iteration index the
        metrics belong to; ``ts`` the latest TrainState (== that step's
        result, or one step ahead under metrics_lag=1); ``prev_ts`` the
        pre-step state if still alive (None once donated)."""
        cfg = self.cfg
        loss_val = float(metrics["loss"])
        if not np.isfinite(loss_val):
            # failure detection the reference lacks (SURVEY.md section 5):
            # snapshot the last-good state before aborting so training can
            # resume instead of silently poisoning the weights.
            saved = ""
            try:
                if prev_ts is not None and cfg.snapshot_prefix:
                    snapshot(cfg.snapshot_prefix + "_lastgood", prev_ts, it)
                    saved = "; last-good state snapshotted"
            except Exception:
                pass  # donated buffers (sharded step) cannot be re-read
            raise FloatingPointError(
                f"non-finite loss {loss_val} at iteration {it}{saved}"
            )
        self.loss_window.append(loss_val)
        for hook in hooks:
            hook(it, ts, metrics)
        if cfg.display and it % cfg.display == 0:
            dt = time.perf_counter() - self._t_last
            self._t_last = time.perf_counter()
            smoothed = float(np.mean(self.loss_window))
            self.log(
                f"Iteration {it}, loss = {smoothed:.4f} "
                f"(lr={float(metrics['lr']):.2e}, "
                f"|g|={float(metrics['grad_norm']):.2f}, {dt:.2f}s)"
            )

    def test(self, ts: TrainState, batches: Iterable) -> dict[str, float]:
        """Average scalar metric tops over test batches (Solver::Test)."""
        sums: dict[str, float] = collections.defaultdict(float)
        n = 0
        for batch in batches:
            outs = self.eval_step(ts.params, ts.state, batch)
            for k, v in outs.items():
                sums[k] += float(v)
            n += 1
        means = {k: v / max(n, 1) for k, v in sums.items()}
        self.log(
            "Test: " + ", ".join(f"{k} = {v:.4f}" for k, v in sorted(means.items()))
        )
        return means

    def _snapshot(self, ts: TrainState):
        # multi-host: only process 0 writes (rank-0 snapshot + barrier
        # semantics of the reference, solver.cpp:523-546); other processes
        # hold identical replicated state so no barrier is needed here.
        rank = (
            self.process_index if self.process_index is not None
            else jax.process_index()
        )
        if rank != 0:
            return
        mp, sp = snapshot(self.cfg.snapshot_prefix, ts, int(ts.it))
        self.log(f"Snapshotting to {mp}")


def polyak_average(model_paths, out_path=None):
    """Average the params of K snapshots (reference polyak_average.py)."""
    from eco_tpu.train.checkpoint import load_model, save_model

    import jax.numpy as jnp

    acc_p = None
    acc_s = None
    for p in model_paths:
        params, state = load_model(p)
        if acc_p is None:
            acc_p, acc_s = params, state
        else:
            acc_p = jax.tree.map(jnp.add, acc_p, params)
            acc_s = jax.tree.map(jnp.add, acc_s, state)
    k = float(len(model_paths))
    acc_p = jax.tree.map(lambda x: x / k, acc_p)
    acc_s = jax.tree.map(lambda x: x / k, acc_s)
    if out_path:
        save_model(out_path, acc_p, acc_s)
    return acc_p, acc_s
