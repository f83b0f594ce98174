"""Real multi-PROCESS distributed training (simulated multi-host).

The reference's actual launch mode is N OS processes under mpirun, each
owning one GPU, exchanging gradients over MPI
(examples/action_recognition/train_action_recognition_rgb.sh:1-8,
solver.cpp:293-304 rank-0 snapshot + barrier).  The TPU-native analogue is N
processes that each call ``jax.distributed.initialize`` and then jointly
execute ONE pjit program over the global device mesh -- GSPMD inserts the
cross-process collectives (here over Gloo on CPU; over ICI/DCN on a real
pod).

This module runs that for real on one machine:

- :func:`worker_main` is the per-process body: ``distributed_init`` ->
  global mesh -> per-process :class:`VideoPipeline` with MPI-style cursor
  sharding (rank*batch start, (world-1)*batch skip) -> ``Trainer.solve``
  over the sharded train step, with process-0-only snapshotting -> a
  params digest written for cross-process comparison.
- :func:`launch_simulated_multihost` is the driver: builds a synthetic
  frame dataset, spawns N workers (each a real OS process on a virtual
  ``devices_per_process``-CPU platform), waits, and asserts that every
  process ended with bitwise-identical replicated parameters and that only
  process 0 wrote snapshots.

Run directly:  ``python -m eco_tpu.parallel.multiprocess -n 2``
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import socket
import subprocess
import sys
from typing import Optional

import numpy as np


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def make_synthetic_dataset(root: str, *, num_videos: int = 8,
                           frames_per_video: int = 12, num_classes: int = 4,
                           size=(48, 64)) -> str:
    """Frame-dir dataset + list file (path n_frames label per line,
    README.md:58-62 format).  Frames encode (video, frame) in their pixels
    so sampling bugs surface as accuracy noise, not silence."""
    import cv2

    lines = []
    rng = np.random.default_rng(0)
    for v in range(num_videos):
        vdir = os.path.join(root, f"vid{v}")
        os.makedirs(vdir, exist_ok=True)
        base = rng.integers(0, 128, (size[0], size[1], 3), np.uint8)
        for f in range(frames_per_video):
            img = np.clip(base.astype(np.int32) + f * 3, 0, 255).astype(np.uint8)
            cv2.imwrite(os.path.join(vdir, "img_%04d.jpg" % (f + 1)), img)
        lines.append(f"{vdir} {frames_per_video} {v % num_classes}")
    list_path = os.path.join(root, "train.txt")
    with open(list_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return list_path


def worker_main(
    process_id: int,
    num_processes: int,
    coordinator: str,
    workdir: str,
    *,
    iters: int = 3,
    iter_size: int = 2,
    per_process_batch: int = 4,
    num_segments: int = 4,
    crop: int = 32,
    num_classes: int = 4,
) -> None:
    import jax

    # the axon sitecustomize pins jax_platforms programmatically; this run
    # is a CPU cluster simulation, so re-pin before backend init
    jax.config.update("jax_platforms", "cpu")
    from eco_tpu.parallel.mesh import distributed_init

    distributed_init(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_index() == process_id
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from eco_tpu.data.pipeline import VideoDataConfig, VideoPipeline
    from eco_tpu.data.transform import TransformConfig
    from eco_tpu.models import build_eco_lite
    from eco_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from eco_tpu.parallel.shard import make_sharded_train_step
    from eco_tpu.runtime import Program
    from eco_tpu.train import SolverConfig
    from eco_tpu.train.loop import Trainer

    mesh = make_mesh({DATA_AXIS: jax.device_count()})
    global_batch = per_process_batch * num_processes

    graph = build_eco_lite(
        num_classes=num_classes, num_segments=num_segments, crop_size=crop,
        with_loss=True, batch=global_batch,
    )
    prog = Program(graph, train=True)

    cfg = SolverConfig(
        base_lr=1e-3, lr_policy="fixed", momentum=0.9, iter_size=iter_size,
        clip_gradients=40.0, solver_type="nesterov", max_iter=iters,
        snapshot=iters, display=1,
        snapshot_prefix=os.path.join(workdir, "snap", "mh"),
        random_seed=7,
    )

    # per-process data plane with the reference's cursor sharding
    pipe = VideoPipeline(
        VideoDataConfig(
            source=os.path.join(workdir, "data", "train.txt"),
            batch_size=per_process_batch,
            num_segments=num_segments,
            shuffle=False,
            new_height=40, new_width=52,
            transform=TransformConfig(crop_size=crop, mirror=True,
                                      mean_values=(104.0, 117.0, 123.0)),
        ),
        train=True, rank=process_id, world=num_processes, num_workers=2,
    )

    data_sh = NamedSharding(mesh, P(None, DATA_AXIS))

    def global_batches():
        """iter_size micro-batches -> ONE global array per name, formed from
        this process's local shard (the multi-host device_put path)."""
        while True:
            micro = [pipe.next_batch() for _ in range(iter_size)]
            local = {
                "data": np.stack([
                    m["data"].reshape(per_process_batch, num_segments, crop,
                                      crop, 3)
                    for m in micro
                ]),
                "label": np.stack([m["label"] for m in micro]),
            }
            yield {
                k: jax.make_array_from_process_local_data(data_sh, v)
                for k, v in local.items()
            }

    step = make_sharded_train_step(prog, cfg, mesh)
    trainer = Trainer(
        prog, cfg, step_fn=step,
        log_fn=lambda m: print(f"[rank {process_id}] {m}", flush=True),
    )
    sample = {
        "data": jnp.zeros((global_batch, num_segments, crop, crop, 3),
                          jnp.float32),
        "label": jnp.zeros((global_batch,), jnp.int32),
    }
    ts = trainer.init_state(sample, seed=0)
    ts = trainer.solve(ts, global_batches())
    pipe.close()

    # digest of the final replicated params: all processes must agree bitwise
    h = hashlib.sha256()
    for lname in sorted(ts.params):
        for pname in sorted(ts.params[lname]):
            h.update(np.ascontiguousarray(
                np.asarray(ts.params[lname][pname])).tobytes())
    digest = h.hexdigest()
    with open(os.path.join(workdir, f"digest_rank{process_id}.json"), "w") as f:
        json.dump({"digest": digest, "iters": int(ts.it),
                   "global_devices": jax.device_count(),
                   "local_devices": jax.local_device_count()}, f)
    print(f"[rank {process_id}] done digest={digest[:12]}", flush=True)


def launch_simulated_multihost(
    num_processes: int = 2,
    *,
    devices_per_process: int = 4,
    workdir: Optional[str] = None,
    timeout: float = 900.0,
    iters: int = 3,
) -> dict:
    """Spawn the N-process cluster and verify the run end-to-end.

    Returns {"digests": [...], "ok": True, ...}; raises on any divergence,
    worker failure, or mis-placed snapshot.
    """
    import tempfile

    workdir = workdir or tempfile.mkdtemp(prefix="eco_multihost_")
    os.makedirs(os.path.join(workdir, "data"), exist_ok=True)
    make_synthetic_dataset(os.path.join(workdir, "data"))
    port = _free_port()

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    import re

    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={devices_per_process}"
    ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    procs = []
    logs = []
    for i in range(num_processes):
        log = open(os.path.join(workdir, f"worker{i}.log"), "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "eco_tpu.parallel.multiprocess",
             "--worker", "--process-id", str(i),
             "--num-processes", str(num_processes),
             "--coordinator", f"localhost:{port}",
             "--workdir", workdir, "--iters", str(iters)],
            env=env, cwd=repo_root, stdout=log, stderr=subprocess.STDOUT,
        ))
    rcs = []
    try:
        for p in procs:
            rcs.append(p.wait(timeout=timeout))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for log in logs:
            log.close()
    if any(rcs):
        tails = {}
        for i in range(num_processes):
            with open(os.path.join(workdir, f"worker{i}.log")) as f:
                tails[i] = f.read()[-2000:]
        raise RuntimeError(f"worker exit codes {rcs}; log tails: {tails}")

    infos = []
    for i in range(num_processes):
        with open(os.path.join(workdir, f"digest_rank{i}.json")) as f:
            infos.append(json.load(f))
    digests = [d["digest"] for d in infos]
    if len(set(digests)) != 1:
        raise RuntimeError(f"params diverged across processes: {digests}")
    if any(d["global_devices"] != num_processes * devices_per_process
           for d in infos):
        raise RuntimeError(f"bad global device counts: {infos}")
    import glob

    snaps = glob.glob(os.path.join(workdir, "snap", "*"))
    if not any(f"_iter_{iters}.model.npz" in s for s in snaps):
        raise RuntimeError(f"process-0 snapshot missing: {snaps}")
    return {
        "ok": True,
        "num_processes": num_processes,
        "devices_per_process": devices_per_process,
        "digest": digests[0],
        "iters": iters,
        "snapshots": sorted(os.path.basename(s) for s in snaps),
        "workdir": workdir,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("-n", "--num-processes", type=int, default=2)
    ap.add_argument("--coordinator", default="")
    ap.add_argument("--workdir", default="")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--devices-per-process", type=int, default=4)
    args = ap.parse_args(argv)
    if args.worker:
        worker_main(args.process_id, args.num_processes, args.coordinator,
                    args.workdir, iters=args.iters)
    else:
        info = launch_simulated_multihost(
            args.num_processes,
            devices_per_process=args.devices_per_process,
            iters=args.iters,
        )
        print(json.dumps(info))


if __name__ == "__main__":
    main()
