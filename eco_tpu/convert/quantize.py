"""Post-training int8 quantization for serving (no reference counterpart).

Pipeline: fold BN into the preceding convs (convert.load.fold_bn, so conv
outputs carry the full affine), CALIBRATE per-tensor activation ranges on
representative batches, then rewrite every forward Conv/InnerProduct layer
to its int8 twin (executor _QConv/_QInnerProduct) with per-output-channel
int8 weights.  Inter-layer tensors stay float; only the MXU sees int8.

Deliberately conservative rewrites:

- Deconvolution and dilated/transposed paths stay float (ECO's serving
  graphs have none);
- layers whose calibrated input range is degenerate (max == 0) stay float;
- everything else (pool/relu/concat/consensus/softmax) is untouched, so
  the quantized graph runs in the same Program executor, shards under the
  same meshes, and exports/imports like any GraphSpec.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp

from eco_tpu.ops.quant import quantize_weight
from eco_tpu.spec.graph import GraphSpec


_QUANT_TYPES = {"convolution": "qconvolution", "innerproduct": "qinnerproduct"}


def _quantizable(layer) -> bool:
    if layer.type.lower() not in _QUANT_TYPES:
        return False
    if layer.type.lower() == "convolution" and layer.opt("transposed", False):
        return False
    return True


def calibrate(program, params, state, batches: Sequence[Mapping[str, Any]],
              ) -> dict[str, float]:
    """Per-tensor |max| of every quantizable layer's input blob.

    One jitted capture pass per batch (the profiler's blob-peek mechanism,
    Program.apply(capture=...)); returns {layer_name: act_max} as host
    floats, ready to bake into the quantized GraphSpec as static scales.
    """
    targets = {
        l.name: l.bottoms[0]
        for l in program.exec_layers if _quantizable(l)
    }
    blobs = sorted(set(targets.values()))

    @jax.jit
    def maxes(p, s, inputs):
        outs, _ = program.apply(p, s, inputs, capture=blobs)
        return {b: jnp.max(jnp.abs(outs[b].astype(jnp.float32)))
                for b in blobs}

    agg = {b: 0.0 for b in blobs}
    for batch in batches:
        m = maxes(params, state, batch)
        for b in blobs:
            agg[b] = max(agg[b], float(m[b]))
    return {lname: agg[b] for lname, b in targets.items()}


def quantize_graph(graph: GraphSpec, params: Mapping,
                   act_maxes: Mapping[str, float]):
    """Rewrite quantizable layers to q-types; returns (qgraph, qparams).

    ``act_maxes`` maps layer name -> calibrated |max| of its input; layers
    absent from it (or with a degenerate range) keep their float form.
    """
    qlayers = []
    qparams = {k: dict(v) for k, v in params.items()}
    quantized: list[str] = []
    for l in graph.layers:
        amax = act_maxes.get(l.name, 0.0)
        if not (_quantizable(l) and amax > 0.0 and l.name in params):
            qlayers.append(l)
            continue
        w_q, w_scale = quantize_weight(params[l.name]["w"], axis=-1)
        lp = dict(qparams[l.name])
        lp["w"] = w_q
        lp["w_scale"] = w_scale
        qparams[l.name] = lp
        opts = dict(l.options)
        opts["act_scale"] = float(amax) / 127.0
        qlayers.append(l.replace(
            type=_QUANT_TYPES[l.type.lower()], options=opts
        ))
        quantized.append(l.name)
    qgraph = GraphSpec(
        name=graph.name + "_int8",
        inputs=dict(graph.inputs),
        layers=qlayers,
        options=dict(graph.options),
    )
    return qgraph, qparams, quantized


def quantize_for_serving(program, params, state,
                         calib_batches: Sequence[Mapping[str, Any]],
                         *, fold: bool = True,
                         compute_dtype=None):
    """One-call post-training quantization: fold BN -> calibrate -> rewrite.

    Returns (qprogram, qparams, qstate, report).  ``report['quantized']``
    lists the rewritten layers; ``report['act_scales']`` the baked scales.
    """
    from eco_tpu.runtime.executor import Program

    graph, p, s = program.graph, params, state
    if fold:
        from eco_tpu.convert.load import fold_bn

        graph, p, s = fold_bn(graph, p, s)
        program = Program(
            graph, train=False,
            compute_dtype=compute_dtype or program.compute_dtype,
        )
    act_maxes = calibrate(program, p, s, calib_batches)
    qgraph, qp, quantized = quantize_graph(graph, p, act_maxes)
    qprog = Program(
        qgraph, train=False,
        compute_dtype=compute_dtype or program.compute_dtype,
    )
    report = {
        "quantized": quantized,
        "act_scales": {
            l.name: l.opt("act_scale") for l in qgraph.layers
            if l.type in ("qconvolution", "qinnerproduct")
        },
    }
    return qprog, qp, s, report
