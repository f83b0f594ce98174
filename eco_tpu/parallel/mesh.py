"""Device mesh construction and distributed bootstrap.

Replaces the reference's MPI bootstrap (GlobalInit/MPI_Init_thread +
rank->GPU mapping, common.cpp:51-74, tools/caffe.cpp:128-160) with
``jax.distributed`` + ``jax.sharding.Mesh``.  Axis conventions:

- ``data``    -- data parallelism over videos (the reference's MPI DP);
- ``segment`` -- sharding the temporal segment axis of the 3D head over ICI
  (the analogue of the reference's batch-axis Gather/Scatter sections, see
  SURVEY.md section 5);
- ``model``   -- reserved for channel/tensor sharding of the classifier.

The reference's ``group_id`` communicator split (Caffe::MPI_split_comm,
common.hpp:195-199) maps to carving sub-meshes out of the device grid.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SEGMENT_AXIS = "segment"
MODEL_AXIS = "model"


_CLUSTER_ENV_VARS = (
    # cluster launchers jax.distributed can auto-detect (the reference
    # reached these via mpirun, train_action_recognition_rgb.sh:1-8); probed
    # by :func:`multihost_evidence` to decide whether a failed/late
    # ``distributed_init`` may be swallowed.  Vars that are also set on
    # single-host boxes (TPU_WORKER_ID=0, any K8s pod) only count when their
    # value implies world > 1.
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "SLURM_NTASKS",
    "OMPI_COMM_WORLD_SIZE",
    "PMI_SIZE",
    "TPU_WORKER_HOSTNAMES",
)


def multihost_evidence() -> Optional[str]:
    """Best-effort probe: does the environment say this process belongs to a
    MULTI-process job?  Returns a ``VAR=value`` description or None.

    Used to decide whether a failed/late ``jax.distributed.initialize`` is
    benign (plain single host -> None) or a silent-desync hazard (peers are
    forming a cluster this process would drop out of).
    """
    import os

    for var in _CLUSTER_ENV_VARS:
        val = os.environ.get(var)
        if not val:
            continue
        if var in ("SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE", "PMI_SIZE"):
            try:
                if int(val) <= 1:
                    continue  # single-task allocation
            except ValueError:
                pass
        elif var == "TPU_WORKER_HOSTNAMES":
            if len([h for h in val.split(",") if h.strip()]) <= 1:
                continue  # single-host TPU VM sets this too
        return f"{var}={val}"
    return None


def distributed_init(**kwargs) -> None:
    """Multi-host bootstrap (MPI_Init equivalent).

    Always attempts ``jax.distributed.initialize`` so auto-detection paths
    that need no env vars (Cloud TPU pod metadata, K8s cluster classes) are
    never skipped.  Failure classification: "no cluster detected" (missing
    coordinator_address from auto-detection) is the benign single-host case
    and becomes a no-op; any error with explicit user config, and any
    join-failure on a DETECTED cluster (unreachable coordinator,
    inconsistent process counts), PROPAGATES -- a host silently falling back
    to single-process while its peers formed the cluster would train
    un-synchronized.  "Already initialized" is always swallowed.

    Because the classification below keys on exception-message substrings
    (fragile across JAX versions), every swallow branch FIRST consults
    :func:`multihost_evidence`: if the environment shows a multi-process job
    (SLURM/OpenMPI world > 1, an explicit coordinator address, multiple TPU
    worker hostnames), nothing but "already initialized" is swallowed.
    """

    explicit = any(v is not None for v in kwargs.values()) if kwargs else False
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:
        msg = str(e).lower()
        if "already" in msg:
            return  # initialized earlier in this process
        if explicit:
            raise  # user-supplied config is wrong -- surface it
        evidence = multihost_evidence()
        if evidence is not None:
            # A cluster job is visibly around this process; whatever went
            # wrong (late init after an XLA computation locked the backend,
            # unreachable coordinator, a JAX version changing its error
            # strings), proceeding single-process here means training
            # UN-synchronized next to live peers.  Surface it.
            raise RuntimeError(
                f"jax.distributed.initialize failed but the environment "
                f"indicates a multi-process job ({evidence}); refusing to "
                f"fall back to single-process"
            ) from e
        if ("coordinator_address" in msg or "could not find" in msg
                or "unable to detect" in msg or "auto-detect" in msg):
            # auto-detection found NO cluster (plain single host, incl. a
            # single-host TPU VM where TPU_WORKER_HOSTNAMES is still set)
            # -> single-process is the correct outcome
            return
        if "must be called before" in msg:
            # the XLA backend is already up, so this is a LATE auto call in
            # an already-running single-process program (no cluster evidence,
            # checked above); its process layout is locked in either way
            # -> no-op
            return
        # unrecognized failure: surface rather than guess
        raise


def make_mesh(
    axes: Optional[Mapping[str, int]] = None,
    *,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a named mesh. Default: 1-D data mesh over all devices.

    ``axes`` maps axis name -> size; sizes must multiply to the device count
    (use -1 for one inferred axis).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if not axes:
        axes = {DATA_AXIS: n}
    axes = dict(axes)
    sizes = list(axes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
        axes = dict(zip(axes.keys(), sizes))
    total = int(np.prod(list(axes.values())))
    if total != n:
        raise ValueError(f"mesh axes {axes} do not cover {n} devices")
    grid = np.asarray(devices).reshape(tuple(axes.values()))
    return Mesh(grid, tuple(axes.keys()))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: int = 0, mesh_axis: str = DATA_AXIS) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = mesh_axis
    return NamedSharding(mesh, P(*spec))
