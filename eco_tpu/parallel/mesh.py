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
    # jax.distributed auto-detection sources (clusters the reference reached
    # via mpirun, train_action_recognition_rgb.sh:1-8)
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "SLURM_JOB_ID",
    "OMPI_COMM_WORLD_SIZE",
    "TPU_WORKER_HOSTNAMES",
    "MEGASCALE_COORDINATOR_ADDRESS",
)


def distributed_init(**kwargs) -> None:
    """Multi-host bootstrap (MPI_Init equivalent).

    No-op on a plain single-host launch (no explicit config and no cluster
    environment detected).  Real configuration errors -- bad coordinator
    address, inconsistent process counts -- PROPAGATE; only the benign
    "already initialized" case is swallowed.
    """
    import os

    explicit = any(v is not None for v in kwargs.values()) if kwargs else False
    if not explicit and not any(v in os.environ for v in _CLUSTER_ENV_VARS):
        return  # single host, nothing to initialize
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:
        if "already" in str(e).lower():
            return  # initialized earlier in this process
        if explicit:
            raise  # user-supplied config is wrong -- surface it
        # auto path: cluster-ish env vars present but no usable coordinator
        # was detected (e.g. a TPU VM env on a single host) -> single-process
        return


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
