"""Weight import from caffemodels + BN folding for inference.

- :func:`import_caffe_weights`: name-based transfer of converted blobs into a
  Program's (params, state) trees (CopyTrainedLayersFrom parity,
  net.cpp:852-876), with layout conversion:
    conv   (out, in/g, *k)  -> (*k, in/g, out)   [OIHW->HWIO / OIDHW->DHWIO]
    ip     (out, in)        -> (in, out)
    bn     4 blobs (1,C,1,1): slope, bias, running mean, running var
           (``inv_std`` style checkpoints are converted: var = istd^-2 - eps,
           bn_convert_style.py:13-33)
- :func:`fold_bn`: graph+params surgery absorbing inference-mode BN into the
  preceding Convolution/InnerProduct (gen_bn_inference.py:23-80); BNs whose
  producer is not foldable (e.g. after an Eltwise sum) become per-channel
  Scale layers, mirroring the reference's Scale+Shift replacement path.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import jax.numpy as jnp

from eco_tpu.convert.caffemodel import load_caffemodel
from eco_tpu.ops.norm import DEFAULT_EPS
from eco_tpu.spec.graph import GraphSpec, LayerSpec


def convert_conv_weight(w: np.ndarray, *, transposed: bool = False) -> np.ndarray:
    """Convolution: (out, in/g, k...) -> (k..., in/g, out).

    Deconvolution blobs are stored (in, out/g, k...) in Caffe
    (deconv_layer swaps the channel roles), and our deconv op expects
    (k..., in, out) -- same permutation, different meaning of the first
    two axes; ``transposed`` only documents the distinction.
    """
    nsp = w.ndim - 2
    if transposed:
        perm = tuple(range(2, 2 + nsp)) + (0, 1)
    else:
        perm = tuple(range(2, 2 + nsp)) + (1, 0)
    return np.ascontiguousarray(np.transpose(w, perm))


def import_caffe_weights(
    graph: GraphSpec,
    params: Mapping,
    state: Mapping,
    caffe_paths: str | Sequence[str],
    *,
    bn_style: str = "var",
    eps: float = DEFAULT_EPS,
    strict: bool = False,
):
    """Load one or more .caffemodel files (comma-separated like the
    reference's --weights) into copies of (params, state).

    Returns (params, state, report) where report lists loaded/skipped names.
    """
    if isinstance(caffe_paths, str):
        caffe_paths = [p for p in caffe_paths.split(",") if p]
    new_params = {k: dict(v) for k, v in params.items()}
    new_state = {k: dict(v) for k, v in state.items()}
    loaded, skipped = [], []
    for path in caffe_paths:
        for lname, entry in load_caffemodel(path).items():
            blobs = entry["blobs"]
            if lname not in new_params and lname not in new_state:
                skipped.append(lname)
                continue
            try:
                spec_type = graph.layer(lname).type
            except KeyError:
                spec_type = entry["type"].lower()
            if spec_type in ("convolution", "deconvolution"):
                w = convert_conv_weight(
                    blobs[0], transposed=spec_type == "deconvolution"
                )
                _assign(new_params, lname, "w", w, strict)
                if len(blobs) > 1:
                    _assign(new_params, lname, "b", blobs[1].reshape(-1), strict)
            elif spec_type == "innerproduct":
                _assign(new_params, lname, "w", blobs[0].T, strict)
                if len(blobs) > 1:
                    _assign(new_params, lname, "b", blobs[1].reshape(-1), strict)
            elif spec_type == "bn":
                gamma, beta, mean, var = (b.reshape(-1) for b in blobs[:4])
                if bn_style == "inv_std":
                    var = np.power(var, -2.0) - eps
                _assign(new_params, lname, "gamma", gamma, strict)
                _assign(new_params, lname, "beta", beta, strict)
                _assign(new_state, lname, "mean", mean, strict, state_tree=True)
                _assign(new_state, lname, "var", var, strict, state_tree=True)
            elif spec_type == "scale":
                _assign(new_params, lname, "scale", blobs[0].reshape(-1), strict)
                if len(blobs) > 1:
                    _assign(new_params, lname, "shift", blobs[1].reshape(-1), strict)
            elif spec_type == "batchnorm":
                # new-style BatchNorm: mean, var, scale_factor (the stats are
                # divided by scale_factor on use, batch_norm_layer.cpp)
                factor = float(blobs[2].reshape(-1)[0]) if len(blobs) > 2 else 1.0
                factor = 1.0 / factor if factor != 0 else 0.0
                _assign(new_state, lname, "mean", blobs[0].reshape(-1) * factor,
                        strict, state_tree=True)
                _assign(new_state, lname, "var", blobs[1].reshape(-1) * factor,
                        strict, state_tree=True)
            else:
                skipped.append(lname)
                continue
            loaded.append(lname)
    if strict and skipped:
        raise ValueError(f"unmatched caffemodel layers: {skipped}")
    return new_params, new_state, {"loaded": loaded, "skipped": skipped}


def _assign(tree, lname, pname, value, strict, state_tree=False):
    if lname not in tree or pname not in tree[lname]:
        if strict:
            raise ValueError(f"model has no {lname}/{pname}")
        return
    cur = tree[lname][pname]
    if tuple(cur.shape) != tuple(value.shape):
        raise ValueError(
            f"{lname}/{pname}: caffemodel shape {value.shape} != model {cur.shape}"
        )
    tree[lname][pname] = jnp.asarray(value, jnp.result_type(cur))


# ---------------------------------------------------------------------------
# BN folding
# ---------------------------------------------------------------------------

def fold_bn(graph: GraphSpec, params: Mapping, state: Mapping,
            *, eps: float = DEFAULT_EPS):
    """Absorb inference-mode BN layers; returns (new_graph, new_params, new_state).

    Same decision procedure as gen_bn_inference.py: a BN folds into the most
    recent layer producing its bottom iff that layer is Conv/InnerProduct;
    otherwise it is replaced by a Scale layer with precomputed scale/shift.
    """
    producer: dict[str, LayerSpec] = {}
    new_layers: list[LayerSpec] = []
    new_params = {k: dict(v) for k, v in params.items()}
    new_state = {k: dict(v) for k, v in state.items()}
    rename: dict[str, str] = {}

    # A fold changes the producer's output values, so it is only legal when
    # the BN is the *sole* consumer of that blob.  (ECO's 3D residual adds
    # consume pre-BN conv tops -- res3a feeds both res3a_bn and the res3b
    # Eltwise, ECO_Lite.prototxt:1352-1437 -- so those BNs must become Scale
    # layers instead.  The reference gen_bn_inference.py lacks this guard.)
    consumers: dict[str, int] = {}
    for l in graph.layers:
        for bname in l.bottoms:
            if bname not in l.tops:  # in-place layers don't count
                consumers[bname] = consumers.get(bname, 0) + 1

    def resolve(names):
        return tuple(rename.get(n, n) for n in names)

    for l in graph.layers:
        bottoms = resolve(l.bottoms)
        l = l.replace(bottoms=bottoms, tops=resolve(l.tops))
        if l.type == "bn":
            src = producer.get(l.bottoms[0])
            # Stay in jnp/f32 on device: np.asarray here would be a
            # synchronous device->host fetch per blob (hundreds of relay
            # round-trips on a remote chip); jnp ops dispatch async.
            g = jnp.asarray(new_params[l.name]["gamma"], jnp.float32)
            b = jnp.asarray(new_params[l.name]["beta"], jnp.float32)
            m = jnp.asarray(new_state[l.name]["mean"], jnp.float32)
            v = jnp.asarray(new_state[l.name]["var"], jnp.float32)
            scale = g / jnp.sqrt(v + eps)
            shift = b - m * scale
            foldable = (
                src is not None
                and src.type in ("convolution", "innerproduct")
                and l.bottoms[0] not in graph.inputs
                and consumers.get(l.bottoms[0], 0) == 1
            )
            if foldable:
                sp = new_params[src.name]
                w = jnp.asarray(sp["w"], jnp.float32)
                sp["w"] = w * scale
                bias = (jnp.asarray(sp["b"], jnp.float32) if "b" in sp
                        else jnp.zeros((w.shape[-1],), jnp.float32))
                sp["b"] = bias * scale + shift
                # BN's top now refers to the conv's output
                rename[l.tops[0]] = l.bottoms[0]
                del new_params[l.name]
                new_state.pop(l.name, None)
                continue
            # fallback: standalone Scale layer
            new_layers.append(
                LayerSpec(l.name, "scale", l.bottoms, l.tops, {}, l.phase)
            )
            new_params[l.name] = {"scale": scale, "shift": shift}
            new_state.pop(l.name, None)
            continue
        new_layers.append(l)
        for t in l.tops:
            producer[t] = l
    folded = GraphSpec(graph.name + "_folded", dict(graph.inputs), new_layers,
                       dict(graph.options))
    return folded, new_params, new_state
