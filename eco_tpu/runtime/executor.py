"""GraphSpec -> pure jittable function: the TPU-native ``Net``.

The reference's ``Net<Dtype>`` (src/caffe/net.cpp) is an imperative per-layer
interpreter with hand-managed buffers.  Here ``Program`` walks the layer list
exactly once *at trace time*; the result is a single XLA program in which
layer boundaries no longer exist -- XLA fuses elementwise chains into convs
and assigns buffers globally (subsuming Net::MemoryOptimize_v2,
net.cpp:1080-1277).

Functional state contract (instead of mutable blobs_):
    params: {layer_name: {param_name: array}}   -- trainable
    state:  {layer_name: {stat_name:  array}}   -- BN running stats etc.
    apply(params, state, inputs, train, rng) -> (blobs, new_state)

Physical layout convention: activations are channels-last (logical Caffe
axis 1 moved to the end) for rank >= 3; matrices are (N, D).  Generic
Reshape/Permute layers bridge through logical layout
(eco_tpu.ops.layout.to_logical/to_physical); the hot ECO patterns use the
dedicated fold/unfold/consensus ops which are free reshapes.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass
from typing import Any, Mapping, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from eco_tpu import ops
from eco_tpu.runtime.init import fill
from eco_tpu.spec.graph import TRAIN, TEST, GraphSpec, LayerSpec
from eco_tpu.utils.shapes import normalize_spatial_param

# Layer types whose tops are host-provided (the data boundary).
DATA_LAYER_TYPES = {
    "videodata", "input", "imagedata", "data", "memorydata", "hdf5data",
    "windowdata", "segdata",
}


@dataclass
class Context:
    train: bool = False
    rng: Optional[jax.Array] = None
    compute_dtype: Any = None  # e.g. jnp.bfloat16; None = keep input dtype
    bn_axis_name: Optional[str] = None  # set inside shard_map for SyncBN

    def layer_rng(self, layer_name: str) -> Optional[jax.Array]:
        if self.rng is None:
            return None
        return jax.random.fold_in(self.rng, zlib.crc32(layer_name.encode()))


# --------------------------------------------------------------------------
# Layer implementations
# --------------------------------------------------------------------------


class LayerImpl:
    """One graph-layer type: param/state declaration + traced apply."""

    def param_specs(self, spec: LayerSpec, in_shapes) -> dict:
        return {}

    def state_specs(self, spec: LayerSpec, in_shapes) -> dict:
        return {}

    def apply(self, spec, params, state, inputs, ctx) -> tuple[list, Optional[dict]]:
        raise NotImplementedError


class _Conv(LayerImpl):
    """Convolution / Deconvolution (reference base_conv_layer.cpp:13-188)."""

    def _geometry(self, spec, in_shape):
        num_spatial = len(in_shape) - 2
        k = spec.opt("kernel_size")
        if k is None:
            k = (spec.opt("kernel_h"), spec.opt("kernel_w"))
        kernel = normalize_spatial_param(k, num_spatial)
        return num_spatial, kernel

    @staticmethod
    def _transposed(spec) -> bool:
        # Deconvolution dispatches by layer TYPE (deconv_layer.cpp), not an
        # option: prototxt import has no "transposed" field to set.  The
        # explicit option remains as an override for hand-built specs.
        return spec.type == "deconvolution" or bool(spec.opt("transposed", False))

    def param_specs(self, spec, in_shapes):
        in_shape = in_shapes[0]
        _, kernel = self._geometry(spec, in_shape)
        cin = in_shape[-1]
        cout = int(spec.opt("num_output"))
        groups = int(spec.opt("group", 1))
        if self._transposed(spec):
            # Caffe deconv blob is (C_in, C_out/g, *k); ours is spatial-first
            # (*k, C_in, C_out/g) -- see convert.load.convert_conv_weight.
            wshape = tuple(kernel) + (cin, cout // groups)
        else:
            wshape = tuple(kernel) + (cin // groups, cout)
        out = {
            "w": (
                wshape,
                jnp.float32,
                spec.opt("weight_filler", {"type": "xavier"}),
            )
        }
        if spec.opt("bias_term", True):
            out["b"] = ((cout,), jnp.float32, spec.opt("bias_filler", {"type": "constant"}))
        return out

    def apply(self, spec, params, state, inputs, ctx):
        y = ops.conv_nd(
            inputs[0],
            params["w"],
            params.get("b"),
            stride=spec.opt("stride", 1),
            pad=spec.opt("pad", 0),
            dilation=spec.opt("dilation", 1),
            groups=int(spec.opt("group", 1)),
            transposed=self._transposed(spec),
        )
        return [y], None


class _QConv(LayerImpl):
    """int8-quantized Convolution (serving-only TPU extension, no reference
    counterpart): float in/out, int8 x int8 -> int32 on the MXU.  Emitted by
    eco_tpu.convert.quantize.quantize_for_serving; carries its calibrated
    per-tensor input scale in options['act_scale']."""

    def param_specs(self, spec, in_shapes):
        base = _Conv().param_specs(spec, in_shapes)
        wshape = base["w"][0]
        out = {
            "w": (wshape, jnp.int8, {"type": "constant"}),
            "w_scale": ((wshape[-1],), jnp.float32,
                        {"type": "constant", "value": 1.0}),
        }
        if "b" in base:
            out["b"] = base["b"]
        return out

    def apply(self, spec, params, state, inputs, ctx):
        from eco_tpu.ops.quant import conv_nd_int8

        if ctx.train:
            # round() has zero gradient a.e.: training would silently
            # learn nothing through this layer
            raise ValueError(
                f"int8 layer {spec.name!r} is serving-only; train the "
                "float model and re-quantize (convert.quantize)"
            )
        out_scale = spec.opt("out_scale")
        y = conv_nd_int8(
            inputs[0],
            params["w"],
            params["w_scale"],
            params.get("b"),
            act_scale=float(spec.opt("act_scale")),
            stride=spec.opt("stride", 1),
            pad=spec.opt("pad", 0),
            dilation=spec.opt("dilation", 1),
            groups=int(spec.opt("group", 1)),
            out_scale=float(out_scale) if out_scale is not None else None,
            out_dtype=ctx.compute_dtype,
        )
        return [y], None


class _QInnerProduct(LayerImpl):
    """int8-quantized InnerProduct (see _QConv)."""

    def param_specs(self, spec, in_shapes):
        base = _InnerProduct().param_specs(spec, in_shapes)
        wshape = base["w"][0]
        out = {
            "w": (wshape, jnp.int8, {"type": "constant"}),
            "w_scale": ((wshape[-1],), jnp.float32,
                        {"type": "constant", "value": 1.0}),
        }
        if "b" in base:
            out["b"] = base["b"]
        return out

    def apply(self, spec, params, state, inputs, ctx):
        from eco_tpu.ops.quant import inner_product_int8

        if ctx.train:
            raise ValueError(
                f"int8 layer {spec.name!r} is serving-only; train the "
                "float model and re-quantize (convert.quantize)"
            )
        x = inputs[0]
        if x.ndim > 2:
            x = ops.to_logical(x).reshape(x.shape[0], -1)
        out_scale = spec.opt("out_scale")
        y = inner_product_int8(
            x, params["w"], params["w_scale"], params.get("b"),
            act_scale=float(spec.opt("act_scale")),
            out_scale=float(out_scale) if out_scale is not None else None,
            out_dtype=ctx.compute_dtype,
        )
        return [y], None


class _InnerProduct(LayerImpl):
    def param_specs(self, spec, in_shapes):
        din = 1
        for d in in_shapes[0][1:]:
            din *= d
        dout = int(spec.opt("num_output"))
        out = {
            "w": ((din, dout), jnp.float32, spec.opt("weight_filler", {"type": "xavier"}))
        }
        if spec.opt("bias_term", True):
            out["b"] = ((dout,), jnp.float32, spec.opt("bias_filler", {"type": "constant"}))
        return out

    def apply(self, spec, params, state, inputs, ctx):
        x = inputs[0]
        if x.ndim > 2:
            # Caffe flattens trailing axes in *logical* order.
            x = ops.to_logical(x).reshape(x.shape[0], -1)
        return [ops.inner_product(x, params["w"], params.get("b"))], None


class _BN(LayerImpl):
    """BN with Caffe-engine/cuDNN/frozen/Sync semantics (see ops.norm)."""

    def param_specs(self, spec, in_shapes):
        c = in_shapes[0][-1]
        return {
            "gamma": ((c,), jnp.float32, spec.opt("slope_filler", {"type": "constant", "value": 1.0})),
            "beta": ((c,), jnp.float32, spec.opt("bias_filler", {"type": "constant", "value": 0.0})),
        }

    def state_specs(self, spec, in_shapes):
        c = in_shapes[0][-1]
        return {"mean": ((c,), jnp.float32, 0.0), "var": ((c,), jnp.float32, 1.0)}

    def apply(self, spec, params, state, inputs, ctx):
        frozen = bool(spec.opt("frozen", False))
        eps = float(spec.opt("eps", 1e-5))
        if ctx.train and not frozen:
            y, nm, nv = ops.bn_train(
                inputs[0],
                params["gamma"],
                params["beta"],
                state["mean"],
                state["var"],
                eps=eps,
                momentum=float(spec.opt("momentum", 0.9)),
                axis_name=ctx.bn_axis_name,
            )
            return [y], {"mean": nm, "var": nv}
        y = ops.bn_inference(
            inputs[0], params["gamma"], params["beta"], state["mean"], state["var"], eps=eps
        )
        return [y], None


class _ReLU(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        return [ops.relu(inputs[0], float(spec.opt("negative_slope", 0.0)))], None


class _Pooling(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        x = inputs[0]
        if x.dtype == jnp.int8 and spec.opt("in_scale") is not None:
            # int8-accepting float pool (set by convert.quantize.chain_int8
            # on AVE pools inside an int8 chain): fuse the dequant here so
            # the upstream quantized conv can emit int8 -- the elementwise
            # multiply fuses into the pool's producer fusion, and the
            # inter-layer tensor rides HBM at 1 byte instead of 2.
            x = x.astype(jnp.float32) * jnp.float32(spec.opt("in_scale"))
            if ctx.compute_dtype is not None:
                x = x.astype(ctx.compute_dtype)
            inputs = [x] + list(inputs[1:])
        k = spec.opt("kernel_size")
        if k is None and spec.opt("kernel_h") is not None:
            k = (int(spec.opt("kernel_h")), int(spec.opt("kernel_w")))
        s = spec.opt("stride", 1)
        if spec.opt("stride_h") is not None:
            s = (int(spec.opt("stride_h")), int(spec.opt("stride_w")))
        p = spec.opt("pad", 0)
        if spec.opt("pad_h") is not None:
            p = (int(spec.opt("pad_h")), int(spec.opt("pad_w")))
        mode = str(spec.opt("pool", "max")).lower()
        if mode == "stochastic":
            # pooling_layer.cu StoPoolForwardTrain/Test; the reference GPU
            # kernels ignore pad, so reject it rather than silently shift
            if any(normalize_spatial_param(p, inputs[0].ndim - 2, default=0)):
                raise ValueError("STOCHASTIC pooling does not support pad")
            y = ops.stochastic_pool(
                inputs[0], k, s, train=ctx.train, rng=ctx.layer_rng(spec.name)
            )
            return [y], None
        y = ops.pool_nd(
            inputs[0],
            kernel=k,
            stride=s,
            pad=p,
            mode=mode,
            global_pooling=bool(spec.opt("global_pooling", False)),
        )
        return [y], None


class _Dropout(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        y = ops.dropout(
            inputs[0],
            float(spec.opt("dropout_ratio", 0.5)),
            train=ctx.train,
            rng=ctx.layer_rng(spec.name),
        )
        return [y], None


class _Eltwise(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        in_scales = spec.opt("in_scales")
        if in_scales is not None:
            # int8-accepting eltwise (convert.quantize.chain_int8): each
            # int8 input carries its producer's emit scale; dequant here
            # (fuses into this op), compute in float as usual.
            inputs = [
                (x.astype(jnp.float32) * jnp.float32(s)).astype(
                    ctx.compute_dtype or jnp.float32
                ) if (x.dtype == jnp.int8 and s is not None) else x
                for x, s in zip(inputs, in_scales)
            ]
        y = ops.eltwise(
            inputs,
            spec.opt("operation", "sum"),
            spec.opt("coeffs"),
            train=ctx.train,
            rng=ctx.layer_rng(spec.name),
        )
        return [y], None


class _Concat(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        in_scales = spec.opt("in_scales")
        if in_scales is not None:
            # int8-accepting concat (convert.quantize.chain_int8): dequant
            # mixed-scale int8 inputs here; all-int8-same-scale concats are
            # instead left int8 (no in_scales set) and pass through below.
            inputs = [
                (x.astype(jnp.float32) * jnp.float32(s)).astype(
                    ctx.compute_dtype or jnp.float32
                ) if (x.dtype == jnp.int8 and s is not None) else x
                for x, s in zip(inputs, in_scales)
            ]
        # concat_dim is the V0/V1 legacy spelling of axis
        axis = int(spec.opt("axis", spec.opt("concat_dim", 1)))
        if axis == 1 or inputs[0].ndim <= 2:
            if inputs[0].ndim <= 2:
                return [jnp.concatenate(inputs, axis=axis if axis != 1 else -1)], None
            return [ops.concat_channels(inputs)], None
        # Generic axis: bridge through logical layout.
        logical = [ops.to_logical(x) for x in inputs]
        return [ops.to_physical(jnp.concatenate(logical, axis=axis))], None


class _Reshape(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        x = ops.to_logical(inputs[0])
        dims = ops.caffe_reshape_dims(
            x.shape,
            spec.opt("dims"),
            axis=int(spec.opt("axis", 0)),
            num_axes=int(spec.opt("num_axes", -1)),
        )
        return [ops.to_physical(x.reshape(dims))], None


class _Permute(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        x = ops.to_logical(inputs[0])
        order = tuple(int(i) for i in spec.opt("order"))
        return [ops.to_physical(jnp.transpose(x, order))], None


class _Flatten(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        x = ops.to_logical(inputs[0])
        return [x.reshape(x.shape[0], -1)], None


class _FoldSegments(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        return [ops.fold_segments(inputs[0])], None


class _UnfoldSegments(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        return [ops.unfold_segments(inputs[0], int(spec.opt("num_segments")))], None


class _SegmentConsensus(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        x = inputs[0]
        if x.ndim > 2:
            x = ops.global_avg_pool(x)
        return [ops.segment_consensus(x, int(spec.opt("num_segments")))], None


class _GlobalAvgPool(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        x = inputs[0]
        if x.dtype == jnp.int8 and spec.opt("in_scale") is not None:
            # int8-accepting (convert.quantize.chain_int8) -- see _Pooling
            x = x.astype(jnp.float32) * jnp.float32(spec.opt("in_scale"))
            if ctx.compute_dtype is not None:
                x = x.astype(ctx.compute_dtype)
        return [ops.global_avg_pool(x)], None


class _Softmax(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        return [ops.softmax(inputs[0])], None


class _SoftmaxWithLoss(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        logits, labels = inputs[0], inputs[1].astype(jnp.int32)
        loss = ops.softmax_cross_entropy(
            logits,
            labels,
            ignore_label=spec.opt("ignore_label"),
            normalization=spec.opt("normalization", "valid"),
        )
        return [loss], None


class _Accuracy(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        logits, labels = inputs[0], inputs[1].astype(jnp.int32)
        acc = ops.topk_accuracy(
            logits, labels, int(spec.opt("top_k", 1)), ignore_label=spec.opt("ignore_label")
        )
        return [acc], None


class _Scale(LayerImpl):
    """Per-channel scale (+ optional shift) -- the BN-replacement layer
    emitted by gen_bn_inference.py when in-place folding is blocked."""

    def param_specs(self, spec, in_shapes):
        c = in_shapes[0][-1]
        out = {"scale": ((c,), jnp.float32, spec.opt("filler", {"type": "constant", "value": 1.0}))}
        if spec.opt("bias_term", True):
            out["shift"] = ((c,), jnp.float32, {"type": "constant", "value": 0.0})
        return out

    def apply(self, spec, params, state, inputs, ctx):
        x = inputs[0]
        if x.dtype == jnp.int8 and spec.opt("in_scale") is not None:
            # int8-accepting (convert.quantize.chain_int8): the dequant
            # multiply composes with the per-channel scale in one fusion
            x = x.astype(jnp.float32) * jnp.float32(spec.opt("in_scale"))
            if ctx.compute_dtype is not None:
                x = x.astype(ctx.compute_dtype)
        return [ops.scale_shift(x, params["scale"], params.get("shift", 0.0))], None


class _Power(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        a = float(spec.opt("power", 1.0))
        sc = float(spec.opt("scale", 1.0))
        sh = float(spec.opt("shift", 0.0))
        y = sc * inputs[0] + sh
        if a != 1.0:
            y = jnp.power(y, a)
        return [y], None


class _Slice(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        x = ops.to_logical(inputs[0])
        axis = int(spec.opt("axis", 1))
        points = spec.opt("slice_point")
        n_out = len(spec.tops)
        if points is None:
            step = x.shape[axis] // n_out
            points = [step * i for i in range(1, n_out)]
        elif isinstance(points, (int, float)):
            points = [int(points)]  # single slice_point parses as a scalar
        pieces = jnp.split(x, list(points), axis=axis)
        return [ops.to_physical(p) for p in pieces], None


class _Silence(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        return [], None


class _Split(LayerImpl):
    """Fan-out (split_layer.cpp): one bottom copied to N tops.  Caffe inserts
    these automatically; they are free under a functional executor."""

    def apply(self, spec, params, state, inputs, ctx):
        return [inputs[0]] * len(spec.tops), None


class _Identity(LayerImpl):
    """Pass-through (layout peepholes lower no-op reshapes to this)."""

    def apply(self, spec, params, state, inputs, ctx):
        return [inputs[0]], None


class _Sigmoid(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        return [jax.nn.sigmoid(inputs[0])], None


class _TanH(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        return [jnp.tanh(inputs[0])], None


class _AbsVal(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        return [jnp.abs(inputs[0])], None


class _Exp(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        base = spec.opt("base", -1.0)
        scale = float(spec.opt("scale", 1.0))
        shift = float(spec.opt("shift", 0.0))
        y = scale * inputs[0].astype(jnp.float32) + shift
        out = jnp.exp(y) if base == -1.0 else jnp.power(base, y)
        return [out.astype(inputs[0].dtype)], None


class _LRN(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        return [
            ops.elementwise.lrn(
                inputs[0],
                local_size=int(spec.opt("local_size", 5)),
                alpha=float(spec.opt("alpha", 1.0)),
                beta=float(spec.opt("beta", 0.75)),
                k=float(spec.opt("k", 1.0)),
            )
        ], None


class _ArgMax(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        return [jnp.argmax(inputs[0], axis=-1).astype(jnp.float32)], None


class _EuclideanLoss(LayerImpl):
    """0.5/N * sum((a-b)^2), euclidean_loss_layer.cpp."""

    def apply(self, spec, params, state, inputs, ctx):
        a, b = inputs[0].astype(jnp.float32), inputs[1].astype(jnp.float32)
        n = a.shape[0]
        return [0.5 * jnp.sum(jnp.square(a - b)) / n], None


class _BatchNormCaffe(LayerImpl):
    """New-style Caffe "BatchNorm" (3 blobs: mean, var, scale_factor) --
    always paired with a separate Scale layer.  Stats are state; the
    scale_factor normalization (batch_norm_layer.cpp) is applied on import.
    At train time behaves like our BN with gamma=1, beta=0."""

    def state_specs(self, spec, in_shapes):
        c = in_shapes[0][-1]
        return {"mean": ((c,), jnp.float32, 0.0), "var": ((c,), jnp.float32, 1.0)}

    def apply(self, spec, params, state, inputs, ctx):
        c = inputs[0].shape[-1]
        ones = jnp.ones((c,), jnp.float32)
        zeros = jnp.zeros((c,), jnp.float32)
        eps = float(spec.opt("eps", 1e-5))
        use_global = spec.opt("use_global_stats")
        train_stats = ctx.train and not bool(use_global)
        if train_stats:
            y, nm, nv = ops.bn_train(
                inputs[0], ones, zeros, state["mean"], state["var"],
                eps=eps,
                momentum=float(spec.opt("moving_average_fraction", 0.999)),
                axis_name=ctx.bn_axis_name,
            )
            return [y], {"mean": nm, "var": nv}
        y = ops.bn_inference(
            inputs[0], ones, zeros, state["mean"], state["var"], eps=eps
        )
        return [y], None


class _Threshold(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        return [ops.threshold(inputs[0], float(spec.opt("threshold", 0.0)))], None


class _BNLL(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        return [ops.bnll(inputs[0])], None


class _MVN(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        return [
            ops.mvn(
                inputs[0],
                across_channels=bool(spec.opt("across_channels", False)),
                normalize_variance=bool(spec.opt("normalize_variance", True)),
                eps=float(spec.opt("eps", 1e-9)),
            )
        ], None


class _HingeLoss(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        loss = ops.hinge_loss(
            inputs[0], inputs[1].astype(jnp.int32),
            norm=str(spec.opt("norm", "L1")),
        )
        return [loss], None


class _SigmoidCrossEntropyLoss(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        return [ops.sigmoid_cross_entropy(inputs[0], inputs[1])], None


class _InfogainLoss(LayerImpl):
    """Infogain loss (infogain_loss_layer.cpp).  The H matrix arrives either
    as a third bottom or from ``infogain_param { source }`` (a serialized
    BlobProto), loaded into layer state at init."""

    def state_specs(self, spec, in_shapes):
        if len(in_shapes) >= 3:
            return {}
        src = spec.opt("source")
        if src is None:
            raise ValueError(
                f"InfogainLoss {spec.name!r} needs a third bottom or "
                "infogain_param.source"
            )
        from eco_tpu.convert.caffemodel import load_blobproto

        c = in_shapes[0][-1]
        H = np.asarray(load_blobproto(src), np.float32).reshape(c, c)
        return {"H": ((c, c), jnp.float32, jnp.asarray(H))}

    def apply(self, spec, params, state, inputs, ctx):
        H = inputs[2] if len(inputs) >= 3 else state["H"]
        loss = ops.infogain_loss(inputs[0], inputs[1].astype(jnp.int32), H)
        return [loss], None


class _ContrastiveLoss(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        loss = ops.contrastive_loss(
            inputs[0], inputs[1], inputs[2],
            margin=float(spec.opt("margin", 1.0)),
            legacy=bool(spec.opt("legacy_version", False)),
        )
        return [loss], None


class _MultinomialLogisticLoss(LayerImpl):
    """NLL on already-softmaxed probabilities
    (multinomial_logistic_loss_layer.cpp): -1/N sum log(max(p_i,label, 1e-20))."""

    def apply(self, spec, params, state, inputs, ctx):
        p = inputs[0].astype(jnp.float32)
        labels = inputs[1].astype(jnp.int32)
        picked = jnp.take_along_axis(p, labels[:, None], axis=-1)[:, 0]
        loss = -jnp.sum(jnp.log(jnp.maximum(picked, 1e-20))) / p.shape[0]
        return [loss], None


class _DummyData(LayerImpl):
    """In-graph synthetic blobs (dummy_data_layer.cpp): one top per declared
    shape, filled by constant/gaussian/uniform fillers."""

    def _shapes(self, spec):
        shapes = spec.opt("shape", [])
        if isinstance(shapes, dict):
            shapes = [shapes]
        dims = [tuple(int(d) for d in (s.get("dim") if isinstance(s, dict) else s))
                for s in shapes]
        # legacy num/channels/height/width quadruples
        if not dims and spec.opt("num") is not None:
            nums = spec.opt("num")
            nums = nums if isinstance(nums, list) else [nums]
            chans = spec.opt("channels", 1)
            chans = chans if isinstance(chans, list) else [chans] * len(nums)
            hs = spec.opt("height", 1)
            hs = hs if isinstance(hs, list) else [hs] * len(nums)
            ws = spec.opt("width", 1)
            ws = ws if isinstance(ws, list) else [ws] * len(nums)
            dims = [(int(n), int(c), int(h), int(w))
                    for n, c, h, w in zip(nums, chans, hs, ws)]
        if not dims:
            raise ValueError(f"DummyData {spec.name!r} declares no shape")
        # declared shapes are logical NCHW; emit physical channels-last
        return [
            (d[0],) + d[2:] + (d[1],) if len(d) >= 3 else d for d in dims
        ]

    def apply(self, spec, params, state, inputs, ctx):
        fillers = spec.opt("data_filler", [{"type": "constant", "value": 0.0}])
        if isinstance(fillers, dict):
            fillers = [fillers]
        shapes = self._shapes(spec)
        if len(fillers) == 1:
            fillers = fillers * len(shapes)
        elif len(fillers) != len(shapes):
            # dummy_data_layer.cpp CHECKs 1-or-N fillers; without this a
            # zip would silently drop the unmatched tops.
            raise ValueError(
                f"DummyData {spec.name!r}: {len(fillers)} data_fillers for "
                f"{len(shapes)} shapes (need 1 or exactly one per shape)"
            )
        outs = []
        for i, (shape, f) in enumerate(zip(shapes, fillers)):
            ftype = str(f.get("type", "constant")).lower()
            if ftype == "constant":
                outs.append(jnp.full(shape, float(f.get("value", 0.0)), jnp.float32))
            else:
                rng = ctx.layer_rng(spec.name)
                if rng is None:
                    rng = jax.random.PRNGKey(0)
                rng = jax.random.fold_in(rng, i)
                if ftype == "gaussian":
                    x = jax.random.normal(rng, shape, jnp.float32)
                    outs.append(float(f.get("std", 1.0)) * x
                                + float(f.get("mean", 0.0)))
                elif ftype == "uniform":
                    outs.append(jax.random.uniform(
                        rng, shape, jnp.float32,
                        minval=float(f.get("min", 0.0)),
                        maxval=float(f.get("max", 1.0))))
                else:
                    raise ValueError(f"DummyData filler {ftype!r} unsupported")
        return outs, None


class _Log(LayerImpl):
    """y = log_base(shift + scale * x); base -1 means e (log_layer.cpp,
    caffe.proto LogParameter:773-780)."""

    def apply(self, spec, params, state, inputs, ctx):
        base = float(spec.opt("base", -1.0))
        sc = float(spec.opt("scale", 1.0))
        sh = float(spec.opt("shift", 0.0))
        y = jnp.log(sh + sc * inputs[0].astype(jnp.float32))
        if base > 0:
            y = y / np.log(base)
        return [y.astype(inputs[0].dtype)], None


class _PReLU(LayerImpl):
    """Parametric ReLU (prelu_layer.cpp; He et al. 2015): per-channel
    learnable negative slope, optionally shared across channels
    (PReLUParameter:1280-1289).  Filler default 0.25."""

    def param_specs(self, spec, in_shapes):
        c = 1 if spec.opt("channel_shared", False) else in_shapes[0][-1]
        return {"slope": ((c,), jnp.float32,
                          spec.opt("filler", {"type": "constant",
                                              "value": 0.25}))}

    def apply(self, spec, params, state, inputs, ctx):
        x = inputs[0]
        a = params["slope"].astype(x.dtype)
        return [jnp.maximum(x, 0) + a * jnp.minimum(x, 0)], None


class _Bias(LayerImpl):
    """BiasLayer (bias_layer.cpp; BiasParameter:1327-1350): add a bias
    broadcast from logical ``axis`` over ``num_axes`` axes.  The bias is
    bottom[1] when given, else a learned parameter (filler default 0)."""

    def _bias_shape(self, spec, in_shapes):
        # logical (NCHW-style) input shape
        phys = in_shapes[0]
        logical = (phys[0], phys[-1]) + tuple(phys[1:-1]) \
            if len(phys) >= 3 else tuple(phys)
        axis = int(spec.opt("axis", 1)) % len(logical)
        num_axes = int(spec.opt("num_axes", 1))
        if num_axes == -1:
            return logical[axis:], axis
        return logical[axis: axis + num_axes], axis

    def param_specs(self, spec, in_shapes):
        if len(in_shapes) > 1:
            return {}
        shape, _ = self._bias_shape(spec, in_shapes)
        return {"bias": (tuple(shape), jnp.float32,
                         spec.opt("filler", {"type": "constant",
                                             "value": 0.0}))}

    def apply(self, spec, params, state, inputs, ctx):
        x = ops.to_logical(inputs[0])
        if len(inputs) > 1:
            b = ops.to_logical(inputs[1])
            axis = int(spec.opt("axis", 1)) % x.ndim
        else:
            shape, axis = self._bias_shape(
                spec, [inputs[0].shape])
            b = params["bias"]
        # broadcast b across leading axes [0, axis) and all trailing axes
        b = b.reshape((1,) * axis + b.shape
                      + (1,) * (x.ndim - axis - b.ndim))
        return [ops.to_physical(x + b.astype(x.dtype))], None


class _Reduction(LayerImpl):
    """ReductionLayer (reduction_layer.cpp; ReductionParameter:862-893):
    reduce ALL tail axes from logical ``axis`` with SUM/ASUM/SUMSQ/MEAN,
    times ``coeff``."""

    def apply(self, spec, params, state, inputs, ctx):
        x = ops.to_logical(inputs[0]).astype(jnp.float32)
        axis = int(spec.opt("axis", 0)) % x.ndim
        op = str(spec.opt("operation", "sum")).lower()
        coeff = float(spec.opt("coeff", 1.0))
        axes = tuple(range(axis, x.ndim))
        if op in ("sum", "1"):
            y = jnp.sum(x, axis=axes)
        elif op in ("asum", "2"):
            y = jnp.sum(jnp.abs(x), axis=axes)
        elif op in ("sumsq", "3"):
            y = jnp.sum(jnp.square(x), axis=axes)
        elif op in ("mean", "4"):
            y = jnp.mean(x, axis=axes)
        else:
            raise ValueError(f"unknown reduction operation {op!r}")
        y = (coeff * y).astype(inputs[0].dtype)
        return [ops.to_physical(y)], None


class _Normalize(LayerImpl):
    """Per-sample L2 normalization over all non-batch dims
    (normalize_layer.cpp:21-33)."""

    def apply(self, spec, params, state, inputs, ctx):
        x = inputs[0].astype(jnp.float32)
        axes = tuple(range(1, x.ndim))
        norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axes, keepdims=True))
        return [(x / norm).astype(inputs[0].dtype)], None


class _BatchReduction(LayerImpl):
    """The TSN fork's BatchReductionLayer (batch_reduction_layer.cpp):
    reduce logical ``axis`` blockwise.

    - levels [l1, l2, ...] split the axis into blocks of tick_i = l_i^2,
      each reduced with SUM/MEAN; output gains a len(levels) dim in place
      of the axis.  levels == [1] (default) reduces the whole axis with no
      extra dim (:54-63).
    - TOPK (single level): mean of the k largest along the axis (:153-168).
    - pos mode (single level): position-sensitive -- reduces (axis,
      axis+1) jointly reading only the diagonal t*(tick+1) entries
      (:125-129, the R-FCN-style sub-position pick).
    """

    def apply(self, spec, params, state, inputs, ctx):
        rp = spec.opt("reduction_param", {}) or {}
        op = str(rp.get("operation", "sum")).lower()
        axis = int(rp.get("axis", 0))
        levels = spec.opt("level", [1])
        if isinstance(levels, (int, float)):
            levels = [int(levels)]
        levels = [int(l) for l in levels] or [1]
        pos = bool(spec.opt("pos", False))
        x = ops.to_logical(inputs[0])
        axis = axis % x.ndim
        xf = x.astype(jnp.float32)
        if op in ("asum", "2", "sumsq", "3"):
            # the reference declares these NOT_IMPLEMENTED
            # (batch_reduction_layer.cpp Reshape); raise rather than
            # silently computing a plain sum
            raise NotImplementedError(
                f"batch_reduction operation {op!r} is NOT_IMPLEMENTED in "
                "the reference too (batch_reduction_layer.cpp)"
            )

        if pos:
            if len(levels) != 1:
                raise ValueError("pos-sensitive reduction needs one level")
            if axis + 1 >= x.ndim:
                # reference: CHECK_GE(shape.size() - 2, axis)
                raise ValueError(
                    f"pos mode reduces axes ({axis}, {axis + 1}) but the "
                    f"input has only {x.ndim} logical dims"
                )
            tick = x.shape[axis]
            if x.shape[axis + 1] != tick:
                raise ValueError(
                    f"pos mode needs square (axis, axis+1) dims, got "
                    f"{x.shape[axis]}x{x.shape[axis + 1]}"
                )
            diag = jnp.diagonal(xf, axis1=axis, axis2=axis + 1)
            # diagonal moves the diag dim last; reduce it
            y = jnp.sum(diag, axis=-1)
            if op in ("mean", "4"):
                y = y / tick
            if levels != [1]:
                # reference Reshape inserts the len(levels)(=1) level dim
                # before the pos branch trims axis+1 (:54-63)
                y = jnp.expand_dims(y, axis)
            return [ops.to_physical(y.astype(x.dtype))], None

        if op in ("topk", "5"):
            if len(levels) != 1:
                raise ValueError("top-k reduction works with one level")
            k = int(rp.get("k", 1))
            y = jnp.mean(
                jax.lax.top_k(jnp.moveaxis(xf, axis, -1), k)[0], axis=-1
            )
            return [ops.to_physical(y.astype(x.dtype))], None

        ticks = [l * l for l in levels]
        if levels == [1]:
            y = jnp.sum(xf, axis=axis)
            if op in ("mean", "4"):
                y = y / x.shape[axis]
            return [ops.to_physical(y.astype(x.dtype))], None
        if sum(ticks) != x.shape[axis]:
            raise ValueError(
                f"levels {levels} (ticks {ticks}) do not cover axis size "
                f"{x.shape[axis]}"
            )
        pieces = []
        start = 0
        for tick in ticks:
            blk = jax.lax.slice_in_dim(xf, start, start + tick, axis=axis)
            red = jnp.sum(blk, axis=axis)
            if op in ("mean", "4"):
                red = red / tick
            pieces.append(red)
            start += tick
        y = jnp.stack(pieces, axis=axis)  # (..., len(levels), ...)
        return [ops.to_physical(y.astype(x.dtype))], None


class _SPP(LayerImpl):
    """Spatial pyramid pooling (spp_layer.cpp): for level l, a
    2^l x 2^l grid pool with kernel = ceil(dim/bins), pad = (rem+1)/2,
    stride = kernel; each level flattens to (N, C*bins^2) logical and all
    levels concat on that axis.  pyramid_height == 1 degenerates to one
    global pool with unflattened output (:132-139)."""

    def apply(self, spec, params, state, inputs, ctx):
        x = inputs[0]
        height = int(spec.opt("pyramid_height", 1))
        mode = str(spec.opt("pool", "max")).lower()
        if x.ndim != 4:
            raise ValueError("SPP expects a (N, H, W, C) input")
        n, h, w, c = x.shape
        if height == 1:
            return [ops.pool_nd(x, global_pooling=True, mode=mode)], None
        flats = []
        for level in range(height):
            bins = 2 ** level
            kh = -(-h // bins)
            kw = -(-w // bins)
            ph = (kh * bins - h + 1) // 2
            pw = (kw * bins - w + 1) // 2
            if ph >= kh or pw >= kw:
                # Caffe's PoolingLayer CHECKs pad < kernel; without this a
                # ceil-mode clip would emit a bin grid != 2^level x 2^level
                # and silently change the concat feature length.
                raise ValueError(
                    f"SPP level {level}: {bins}x{bins} bins exceed the "
                    f"{h}x{w} feature map (pad >= kernel, the reference "
                    "aborts here too)"
                )
            y = ops.pool_nd(x, kernel=(kh, kw), stride=(kh, kw),
                            pad=(ph, pw), mode=mode)
            # flatten logical (N, C, bh, bw) -> (N, C*bh*bw)
            flats.append(ops.to_logical(y).reshape(n, -1))
        return [jnp.concatenate(flats, axis=1)], None


class _ROIPooling(LayerImpl):
    """Fast R-CNN ROI max pooling -- see ops.roi_max_pool.  Output is
    logical (R, C, pooled_h, pooled_w); physical channels-last."""

    def apply(self, spec, params, state, inputs, ctx):
        ph = int(spec.opt("pooled_h", 0))
        pw = int(spec.opt("pooled_w", 0))
        if ph <= 0 or pw <= 0:
            # reference: CHECK_GT(pooled_h/w, 0) (roi_pooling_layer.cpp:23-26)
            raise ValueError(
                f"ROIPooling {spec.name!r} needs pooled_h/pooled_w > 0 "
                f"(got {ph}x{pw})"
            )
        y = ops.roi_max_pool(
            inputs[0], inputs[1], pooled_h=ph, pooled_w=pw,
            spatial_scale=float(spec.opt("spatial_scale", 1.0)),
        )
        return [y], None


class _SmoothL1Loss(LayerImpl):
    """Fast R-CNN smooth-L1 loss (smooth_L1_loss_layer.cu:13-50):
    d = w * (b0 - b1); loss = sum(f(d)) / N with f(x) = 0.5 x^2 for
    |x| < 1 else |x| - 0.5."""

    def apply(self, spec, params, state, inputs, ctx):
        d = inputs[0].astype(jnp.float32) - inputs[1].astype(jnp.float32)
        if len(inputs) > 2:
            d = d * inputs[2].astype(jnp.float32)
        ad = jnp.abs(d)
        f = jnp.where(ad < 1.0, 0.5 * jnp.square(d), ad - 0.5)
        return [jnp.sum(f) / inputs[0].shape[0]], None


class _Filter(LayerImpl):
    """FilterLayer forwards only the batch items whose selector entry is
    non-zero (filter_layer.cpp: last bottom is the selector, one top per
    data bottom, output batch = number of selected rows) -- a
    DATA-DEPENDENT output shape, which XLA's static-shape compilation
    model cannot express.

    TPU-native executable variant (VERDICT r3 #8): set options
    ``capacity`` (static max selected rows) and the layer compiles as a
    fixed-size gather -- selected rows are compacted to the front in
    original order (filter_layer.cpp preserves order), the remaining
    ``capacity - n_selected`` rows are zero, and each data top is followed
    by ... the ordinary tops; declare ONE EXTRA top to also receive the
    (capacity,) bool validity mask.  Without ``capacity`` the layer keeps
    the reference refusal (use masking instead)."""

    def apply(self, spec, params, state, inputs, ctx):
        cap = spec.opt("capacity")
        if cap is None:
            raise NotImplementedError(
                "Filter has a data-dependent output shape (rows whose "
                "selector is non-zero), which cannot compile under XLA's "
                "static shapes; set options['capacity'] for the fixed-size "
                "gather variant, or use masking (PARITY.md)"
            )
        cap = int(cap)
        *data, sel = inputs
        sel = sel.reshape(sel.shape[0])  # (N,1,1,1) legacy -> (N,)
        n = sel.shape[0]
        keep = sel != 0
        # stable compaction: position of each kept row in the output
        pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
        # idx[j] = input row landing at output j (cap rows, n fill = OOB)
        idx = jnp.full((cap,), n, jnp.int32)
        # rows selected beyond capacity overflow to index cap -> dropped
        idx = idx.at[jnp.where(keep & (pos < cap), pos, cap)].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop"
        )
        valid = idx < n
        outs = [
            jnp.take(d, idx, axis=0, mode="fill", fill_value=0) for d in data
        ]
        if len(spec.tops) == len(data) + 1:
            outs.append(valid)
        return outs, None


class _HDF5Output(LayerImpl):
    """Graph-form HDF5Output (hdf5_output_layer.cpp) -- a sink inside a
    traced program cannot do file IO; the write happens host-side via
    ``eco_tpu.data.hdf5.save_hdf5`` on captured blobs.  In-graph it passes
    nothing on, like Silence."""

    def apply(self, spec, params, state, inputs, ctx):
        return [], None


class _Im2col(LayerImpl):
    def apply(self, spec, params, state, inputs, ctx):
        k = spec.opt("kernel_size")
        if k is None and spec.opt("kernel_h") is not None:
            k = (int(spec.opt("kernel_h")), int(spec.opt("kernel_w")))
        return [
            ops.im2col(
                inputs[0],
                k,
                stride=spec.opt("stride", 1),
                pad=spec.opt("pad", 0),
                dilation=spec.opt("dilation", 1),
            )
        ], None


class _Gather(LayerImpl):
    """Model-parallel section entry (reference gather_layer.cpp): allgather
    activations along the batch so downstream layers run replicated.

    TPU-native translation: a sharding constraint releasing the batch axis to
    replication -- GSPMD inserts the all-gather over ICI.  Outside a mesh
    context this is the identity (single-device semantics: world == 1).
    """

    SPEC = None  # PartitionSpec() == replicated

    def apply(self, spec, params, state, inputs, ctx):
        try:
            from jax.sharding import PartitionSpec as P

            return [jax.lax.with_sharding_constraint(inputs[0], P())], None
        except Exception:
            return [inputs[0]], None


class _Scatter(LayerImpl):
    """Model-parallel section exit: re-shard the batch axis over ``data``
    (reference scatter_layer.cpp is the inverse slice; backward scaling is
    handled by autodiff through the constraint)."""

    def apply(self, spec, params, state, inputs, ctx):
        try:
            from jax.sharding import PartitionSpec as P

            from eco_tpu.parallel.mesh import DATA_AXIS

            x = inputs[0]
            spec_axes = [DATA_AXIS] + [None] * (x.ndim - 1)
            return [jax.lax.with_sharding_constraint(x, P(*spec_axes))], None
        except Exception:
            return [inputs[0]], None


IMPLS: dict[str, LayerImpl] = {
    "convolution": _Conv(),
    "deconvolution": _Conv(),
    "innerproduct": _InnerProduct(),
    "qconvolution": _QConv(),
    "qinnerproduct": _QInnerProduct(),
    "bn": _BN(),
    "relu": _ReLU(),
    "pooling": _Pooling(),
    "dropout": _Dropout(),
    "eltwise": _Eltwise(),
    "concat": _Concat(),
    "reshape": _Reshape(),
    "permute": _Permute(),
    "flatten": _Flatten(),
    "fold_segments": _FoldSegments(),
    "unfold_segments": _UnfoldSegments(),
    "segment_consensus": _SegmentConsensus(),
    "global_avg_pool": _GlobalAvgPool(),
    "softmax": _Softmax(),
    "softmaxwithloss": _SoftmaxWithLoss(),
    "accuracy": _Accuracy(),
    "scale": _Scale(),
    "power": _Power(),
    "slice": _Slice(),
    "silence": _Silence(),
    "gather": _Gather(),
    "scatter": _Scatter(),
    "identity": _Identity(),
    "sigmoid": _Sigmoid(),
    "tanh": _TanH(),
    "absval": _AbsVal(),
    "exp": _Exp(),
    "lrn": _LRN(),
    "argmax": _ArgMax(),
    "euclideanloss": _EuclideanLoss(),
    "batchnorm": _BatchNormCaffe(),
    "split": _Split(),
    "threshold": _Threshold(),
    "bnll": _BNLL(),
    "mvn": _MVN(),
    "hingeloss": _HingeLoss(),
    "sigmoidcrossentropyloss": _SigmoidCrossEntropyLoss(),
    "infogainloss": _InfogainLoss(),
    "contrastiveloss": _ContrastiveLoss(),
    "im2col": _Im2col(),
    "multinomiallogisticloss": _MultinomialLogisticLoss(),
    "dummydata": _DummyData(),
    "hdf5output": _HDF5Output(),
    "log": _Log(),
    "prelu": _PReLU(),
    "bias": _Bias(),
    "reduction": _Reduction(),
    "normalize": _Normalize(),
    "batchreduction": _BatchReduction(),
    "spp": _SPP(),
    "roipooling": _ROIPooling(),
    "smoothl1loss": _SmoothL1Loss(),
    "filter": _Filter(),
}


def get_impl(layer_type: str) -> LayerImpl:
    key = layer_type.lower().replace("_", "")
    for cand in (layer_type.lower(), key):
        if cand in IMPLS:
            return IMPLS[cand]
    raise KeyError(f"no TPU implementation for layer type {layer_type!r}")


# --------------------------------------------------------------------------
# Program
# --------------------------------------------------------------------------


class Program:
    """A phase-filtered, executable view of a GraphSpec.

    ``init`` creates params/state by abstract-evaluating the graph layer by
    layer (no real compute).  ``apply`` is a pure function suitable for
    ``jax.jit`` / ``jax.grad`` / ``shard_map``.
    """

    def __init__(self, graph: GraphSpec, *, train: bool, compute_dtype=None):
        self.graph = graph.filtered(TRAIN if train else TEST)
        self.train = train
        self.compute_dtype = compute_dtype
        self.data_layers = [
            l for l in self.graph.layers if l.type.lower() in DATA_LAYER_TYPES
        ]
        self.exec_layers = [
            l for l in self.graph.layers if l.type.lower() not in DATA_LAYER_TYPES
        ]
        # Graph inputs: declared inputs + data-layer tops.
        self.input_names = list(self.graph.inputs) + [
            t for l in self.data_layers for t in l.tops
        ]
        # in-place layers (top == bottom) do not consume their blob -- a
        # graph ending in conv -> in-place BN/ReLU still outputs "conv"
        consumed = {
            b for l in self.exec_layers for b in l.bottoms if b not in l.tops
        }
        produced = [t for l in self.exec_layers for t in l.tops]
        # In-place layers re-produce their top; keep last producer ordering.
        self.output_names = [t for t in dict.fromkeys(produced) if t not in consumed]
        self.loss_names = [
            l.tops[0]
            for l in self.exec_layers
            if "loss" in l.type.lower() and l.tops
        ]
        # Cross-layer param sharing (LayerParameter.param name -> shared blob,
        # net.cpp param ownership): {layer: {param_index: shared_name}}.
        # The first layer in execution order naming a blob owns it; later
        # layers alias the owner's array instead of creating their own.
        self._shared_specs = {
            l.name: {i: ps.name for i, ps in enumerate(l.params) if ps.name}
            for l in self.exec_layers
            if any(ps.name for ps in l.params)
        }

    def cast_input(self, v):
        """The ONE input-cast policy: float feature tensors (ndim >= 3) go to
        compute_dtype; labels/scalars keep their dtype.  Used by apply and
        the profiler so timings see exactly what production runs."""
        v = jnp.asarray(v)
        if (
            self.compute_dtype is not None
            and jnp.issubdtype(v.dtype, jnp.floating)
            and v.ndim >= 3
        ):
            v = v.astype(self.compute_dtype)
        return v

    # -- initialization ----------------------------------------------------

    def init(self, rng: jax.Array, sample_inputs: Mapping[str, Any]):
        """Build (params, state) from input shapes.

        Shape propagation is fully abstract (``jax.eval_shape``); the actual
        filler arrays are then built by ONE jitted program, so init costs a
        single device dispatch instead of one per parameter (hundreds of
        ~30 ms round-trips on a relay-attached chip).
        """
        blobs = {
            k: jax.ShapeDtypeStruct(jnp.shape(v), jnp.result_type(v))
            for k, v in sample_inputs.items()
        }
        missing = [n for n in self.input_names if n not in blobs]
        if missing:
            raise ValueError(f"sample_inputs missing {missing}")
        fill_jobs: list = []   # (lname, pname, shape, dtype, filler)
        state_jobs: list = []  # (lname, sname, shape, dtype, value)
        ctx = Context(train=False, rng=None)
        shared_owner: dict[str, jax.ShapeDtypeStruct] = {}
        for layer in self.exec_layers:
            impl = get_impl(layer.type)
            in_structs = [blobs[b] for b in layer.bottoms]
            in_shapes = [s.shape for s in in_structs]
            pspecs = impl.param_specs(layer, in_shapes)
            snames = self._shared_specs.get(layer.name, {})
            lp_exec = {}  # owned + aliased placeholder structs
            for i, (pname, (shape, dtype, filler)) in enumerate(pspecs.items()):
                sname = snames.get(i)
                if sname is not None and sname in shared_owner:
                    owner = shared_owner[sname]
                    if tuple(owner.shape) != tuple(shape):
                        raise ValueError(
                            f"layer {layer.name!r} shares param {sname!r} with "
                            f"shape {shape}, owner has {owner.shape}"
                        )
                    lp_exec[pname] = owner
                    continue
                ph = jax.ShapeDtypeStruct(tuple(shape), jnp.dtype(dtype))
                lp_exec[pname] = ph
                fill_jobs.append((layer.name, pname, tuple(shape), dtype, filler))
                if sname is not None:
                    shared_owner[sname] = ph
            sspecs = impl.state_specs(layer, in_shapes)
            ls = {}
            for sname, (shape, dtype, val) in sspecs.items():
                ls[sname] = jax.ShapeDtypeStruct(tuple(shape), jnp.dtype(dtype))
                state_jobs.append((layer.name, sname, tuple(shape), dtype, val))

            def shape_fn(xs, lp, ls, impl=impl, layer=layer):
                outs, _ = impl.apply(layer, lp, ls, list(xs), ctx)
                return outs

            out_structs = jax.eval_shape(shape_fn, in_structs, lp_exec, ls)
            for t, o in zip(layer.tops, out_structs):
                blobs[t] = o

        def build(rng):
            params: dict = {}
            state: dict = {}
            for lname, pname, shape, dtype, filler in fill_jobs:
                sub = jax.random.fold_in(
                    rng, zlib.crc32(f"{lname}/{pname}".encode()))
                params.setdefault(lname, {})[pname] = fill(
                    sub, shape, dtype, filler)
            for lname, sname, shape, dtype, val in state_jobs:
                state.setdefault(lname, {})[sname] = jnp.full(shape, val, dtype)
            return params, state

        return jax.jit(build)(rng)

    # -- execution ----------------------------------------------------------

    def apply(
        self,
        params: Mapping,
        state: Mapping,
        inputs: Mapping[str, Any],
        *,
        rng: Optional[jax.Array] = None,
        capture: Optional[Sequence[str]] = None,
    ):
        """Run the graph. Returns (outputs, new_state).

        ``outputs`` maps every dangling top (and any ``capture``d blob) to its
        value.  ``new_state`` has the same structure as ``state`` with updated
        BN statistics (identical to ``state`` at eval).
        """
        ctx = Context(train=self.train, rng=rng, compute_dtype=self.compute_dtype)
        blobs: dict[str, Any] = {}
        for k, v in inputs.items():
            v = jnp.asarray(v)
            declared = self.graph.inputs.get(k)
            if declared is not None and tuple(v.shape[1:]) != tuple(declared[1:]):
                # batch (axis 0) is free; everything else must match the graph
                # declaration -- otherwise e.g. a wrong segment count would be
                # silently reinterpreted by the segment reshapes.
                raise ValueError(
                    f"input {k!r}: shape {v.shape} does not match declared "
                    f"{declared} (non-batch dims must agree)"
                )
            blobs[k] = self.cast_input(v)
        new_state = dict(state)
        shared_owner: dict[str, Any] = {}  # shared name -> owner array (live)
        for layer in self.exec_layers:
            impl = get_impl(layer.type)
            ins = [blobs[b] for b in layer.bottoms]
            lp = params.get(layer.name, {})
            snames = self._shared_specs.get(layer.name)
            if snames:
                # Resolve cross-layer shared params: align param index ->
                # key via param_specs on the (concrete) input shapes, then
                # alias missing entries to the owner's live array so autodiff
                # accumulates gradients onto the single owned blob.
                pspecs = impl.param_specs(layer, [jnp.shape(x) for x in ins])
                lp = dict(lp)
                for i, pname in enumerate(pspecs):
                    sname = snames.get(i)
                    if sname is None:
                        continue
                    if pname in lp:
                        shared_owner.setdefault(sname, lp[pname])
                    elif sname in shared_owner:
                        lp[pname] = shared_owner[sname]
                    else:
                        raise ValueError(
                            f"layer {layer.name!r} shares param {sname!r} "
                            "but no owner layer provided it"
                        )
            outs, st = impl.apply(
                layer, lp, state.get(layer.name, {}), ins, ctx
            )
            if st:
                new_state[layer.name] = st
            for t, o in zip(layer.tops, outs):
                blobs[t] = o
        wanted = list(self.output_names) + [
            c for c in (capture or ()) if c not in self.output_names
        ]
        return {k: blobs[k] for k in wanted}, new_state

    def total_loss(self, outputs: Mapping[str, Any]):
        """Sum of loss tops weighted by loss_weight (solver.cpp output calc)."""
        total = 0.0
        for l in self.exec_layers:
            if l.tops and l.tops[0] in self.loss_names:
                w = float(l.opt("loss_weight", 1.0))
                total = total + w * outputs[l.tops[0]]
        return total
