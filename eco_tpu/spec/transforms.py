"""Inference graph optimizations (TPU-shaped rewrites).

``merge_sibling_1x1_convs``: Inception blocks launch 3 independent 1x1 convs
(+BN+ReLU) from the same bottom (1x1 / 3x3_reduce / double_3x3_reduce).  On
TPU each one re-reads the full activation from HBM and runs a half-lane
(64-ch) matmul.  Merging them into ONE conv with concatenated output
channels reads the input once and feeds the MXU a 3x wider matmul; the
original per-branch tops become channel slices (which XLA folds into the
consumers).  Only legal at inference (per-branch BNs concatenate exactly);
the pattern requires conv -> BN (sole consumer) -> in-place ReLU.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
import jax.numpy as jnp

from eco_tpu.spec.graph import GraphSpec, LayerSpec


def _conv_key(l: LayerSpec):
    return (
        l.bottoms,
        tuple(np.atleast_1d(l.opt("kernel_size", 1)).tolist()),
        tuple(np.atleast_1d(l.opt("stride", 1)).tolist()),
        tuple(np.atleast_1d(l.opt("pad", 0)).tolist()),
        int(l.opt("group", 1)),
        bool(l.opt("bias_term", True)),
    )


def merge_sibling_1x1_convs(graph: GraphSpec, params: Mapping, state: Mapping):
    """Returns (new_graph, new_params, new_state); inference-only rewrite."""
    layers = graph.layers
    by_name = {l.name: l for l in layers}
    index = {l.name: i for i, l in enumerate(layers)}
    consumers: dict[str, list[LayerSpec]] = {}
    for l in layers:
        for b in l.bottoms:
            if b not in l.tops:
                consumers.setdefault(b, []).append(l)

    def chain_of(conv: LayerSpec):
        """conv -> bn (sole consumer) -> in-place relu; returns (bn, relu).

        The in-place ReLU (top == bottom == bn top) is intentionally absent
        from the consumers map, so it is located by a direct scan.
        """
        cons = consumers.get(conv.tops[0], [])
        if len(cons) != 1 or cons[0].type != "bn":
            return None
        bn = cons[0]
        relus = [
            l for l in layers
            if l.type == "relu" and l.bottoms == bn.tops and l.tops == bn.tops
        ]
        return bn, (relus[0] if relus else None)

    # group sibling 1x1 convs; every member must carry the SAME epilogue
    # (conv -> BN -> in-place ReLU) or the merged in-place ReLU would
    # rectify a branch that should stay linear.
    groups: dict = {}
    for l in layers:
        if l.type != "convolution":
            continue
        k = np.atleast_1d(l.opt("kernel_size", 1))
        if not np.all(k == 1):
            continue
        chain = chain_of(l)
        if chain is None or chain[1] is None:
            continue
        groups.setdefault(_conv_key(l), []).append(l)

    new_params = {k: dict(v) for k, v in params.items()}
    new_state = {k: dict(v) for k, v in state.items()}
    remove: set[str] = set()
    insert: dict[str, list[LayerSpec]] = {}  # anchor conv name -> new layers

    for key, convs in groups.items():
        if len(convs) < 2:
            continue
        convs = sorted(convs, key=lambda l: index[l.name])
        chains = [chain_of(c) for c in convs]
        bns = [c[0] for c in chains]
        # jnp.shape, not np.asarray(...).shape: the latter fetches the whole
        # blob to host (a sync relay round-trip per conv on a remote chip)
        widths = [int(jnp.shape(params[c.name]["w"])[-1]) for c in convs]
        mname = convs[0].name + "__merged"
        # merged conv params
        w = jnp.concatenate([jnp.asarray(params[c.name]["w"]) for c in convs], -1)
        mp = {"w": w}
        if key[5]:
            mp["b"] = jnp.concatenate(
                [jnp.asarray(params[c.name]["b"]) for c in convs]
            )
        new_params[mname] = mp
        # merged bn
        new_params[mname + "_bn"] = {
            "gamma": jnp.concatenate(
                [jnp.asarray(params[b.name]["gamma"]) for b in bns]
            ),
            "beta": jnp.concatenate(
                [jnp.asarray(params[b.name]["beta"]) for b in bns]
            ),
        }
        new_state[mname + "_bn"] = {
            "mean": jnp.concatenate(
                [jnp.asarray(state[b.name]["mean"]) for b in bns]
            ),
            "var": jnp.concatenate(
                [jnp.asarray(state[b.name]["var"]) for b in bns]
            ),
        }
        opts = dict(convs[0].options)
        opts["num_output"] = int(sum(widths))
        merged_layers = [
            LayerSpec(mname, "convolution", convs[0].bottoms, (mname,), opts),
            LayerSpec(mname + "_bn", "bn", (mname,), (mname + "_bn",),
                      dict(bns[0].options)),
            LayerSpec(mname + "_relu", "relu", (mname + "_bn",),
                      (mname + "_bn",)),
            LayerSpec(
                mname + "_split", "slice", (mname + "_bn",),
                tuple(b.tops[0] for b in bns),
                {"axis": 1,
                 "slice_point": list(np.cumsum(widths)[:-1].tolist())},
            ),
        ]
        insert[convs[0].name] = merged_layers
        for c, (bn, relu) in zip(convs, chains):
            remove.add(c.name)
            remove.add(bn.name)
            if relu is not None:
                remove.add(relu.name)
            new_params.pop(c.name, None)
            new_params.pop(bn.name, None)
            new_state.pop(bn.name, None)

    out_layers: list[LayerSpec] = []
    for l in layers:
        if l.name in insert:
            out_layers.extend(insert[l.name])
        if l.name in remove:
            continue
        out_layers.append(l)
    g2 = GraphSpec(graph.name + "_opt", dict(graph.inputs), out_layers,
                   dict(graph.options))
    return g2, new_params, new_state
