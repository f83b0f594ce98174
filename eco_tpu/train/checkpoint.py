"""Snapshot / restore -- the .caffemodel/.solverstate equivalent.

The reference snapshots two artifacts (Solver::Snapshot, solver.cpp:522-546):
the learned net (NetParameter with weights) and the solver state (iteration,
SGD history, path to the net).  We mirror that split:

- ``<prefix>_iter_N.model.npz``  -- params + BN state (deployable alone)
- ``<prefix>_iter_N.solverstate.npz`` -- history + iter (+ model path)

Name-based multi-checkpoint *transfer* init (``--weights=a.npz,b.npz``,
tools/caffe.cpp:82-92 + Net::CopyTrainedLayersFrom, net.cpp:852-876) is
``restore_weights``: later files win on name collisions, missing layers are
left at their random init, shape mismatches raise.

Flat-key codec: pytrees of dicts are flattened to ``layer/param`` keys so the
artifact is a plain portable npz.
"""

from __future__ import annotations

import json
import os
from typing import Mapping, Sequence

import numpy as np
import jax.numpy as jnp


def _esc(name: str) -> str:
    """Escape the key separator: Caffe layer names may contain '/'
    (e.g. 'conv1/7x7_s2' in stock BN-Inception prototxts)."""
    return name.replace("%", "%25").replace("/", "%2F")


def _unesc(name: str) -> str:
    return name.replace("%2F", "/").replace("%25", "%")


def _flatten(tree: Mapping, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{_esc(k)}"
        if isinstance(v, Mapping):
            out.update(_flatten(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Mapping[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = [_unesc(p) for p in key.split("/")]
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        # keep host-side numpy: devices see the data on first use, and
        # host-side tools (fold_bn, polyak, converters) avoid device
        # round-trips entirely
        node[parts[-1]] = v
    return tree


def save_model(path: str, params, state) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {f"params/{k}": v for k, v in _flatten(params).items()}
    flat.update({f"state/{k}": v for k, v in _flatten(state).items()})
    np.savez(path, **flat)


def load_model(path: str):
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    params = _unflatten(
        {k[len("params/"):]: v for k, v in flat.items() if k.startswith("params/")}
    )
    state = _unflatten(
        {k[len("state/"):]: v for k, v in flat.items() if k.startswith("state/")}
    )
    return params, state


def snapshot(prefix: str, train_state, it: int) -> tuple[str, str]:
    """Write model + solver state at iteration ``it``; returns both paths."""
    model_path = f"{prefix}_iter_{it}.model.npz"
    solver_path = f"{prefix}_iter_{it}.solverstate.npz"
    save_model(model_path, train_state.params, train_state.state)
    os.makedirs(os.path.dirname(solver_path) or ".", exist_ok=True)
    flat = {f"history/{k}": v for k, v in _flatten(train_state.history).items()}
    flat["iter"] = np.asarray(int(it), np.int64)
    flat["__manifest__"] = np.frombuffer(
        json.dumps({"learned_net": os.path.basename(model_path)}).encode(), np.uint8
    )
    np.savez(solver_path, **flat)
    return model_path, solver_path


def restore(solver_path: str, train_state):
    """Resume from a .solverstate (Solver::Restore, solver.cpp:549-560)."""
    with np.load(solver_path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    manifest = json.loads(bytes(flat.pop("__manifest__").tobytes()).decode())
    it = int(flat.pop("iter"))
    history = _unflatten(
        {k[len("history/"):]: v for k, v in flat.items() if k.startswith("history/")}
    )
    model_path = os.path.join(
        os.path.dirname(solver_path), manifest["learned_net"]
    )
    params, state = load_model(model_path)
    import dataclasses

    return dataclasses.replace(
        train_state,
        params=params,
        state=state,
        history=history,
        it=jnp.asarray(it, jnp.int32),
    )


def restore_weights(paths: str | Sequence[str], params, state):
    """Name-based transfer from one or more model artifacts (comma list ok).

    Matches layers by name like CopyTrainedLayersFrom; layers absent from the
    artifacts keep their current (random) values -- exactly how the reference
    initializes ECO from the 2D + 3D pretrained caffemodels
    (models_ECO_Lite/kinetics/run.sh).
    """
    if isinstance(paths, str):
        paths = [p for p in paths.split(",") if p]
    new_params = {k: dict(v) for k, v in params.items()}
    new_state = {k: dict(v) for k, v in state.items()}
    loaded_layers = set()
    for path in paths:
        p, s = load_model(path)
        for lname, lp in p.items():
            if lname in new_params:
                for pname, v in lp.items():
                    cur = new_params[lname][pname]
                    if tuple(v.shape) != tuple(cur.shape):
                        raise ValueError(
                            f"{path}: layer {lname}/{pname} shape {v.shape} "
                            f"!= model {cur.shape}"
                        )
                    new_params[lname][pname] = v
                loaded_layers.add(lname)
        for lname, ls in s.items():
            if lname in new_state:
                for sname, v in ls.items():
                    new_state[lname][sname] = v
    return new_params, new_state, sorted(loaded_layers)
