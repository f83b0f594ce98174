"""V2-only layer tail: the remaining layers in the reference's
src/caffe/layers/ directory beyond the V1 enum (round 3).

Numerics are pinned against numpy transliterations of the reference C++
(file:line cites in each impl's docstring).
"""

import math

import numpy as np
import numpy.testing as npt
import pytest
import jax
import jax.numpy as jnp

from eco_tpu.runtime import Program
from eco_tpu.runtime.executor import (
    Context, DATA_LAYER_TYPES, IMPLS, get_impl,
)
from eco_tpu.spec.graph import LayerSpec
from eco_tpu.spec.prototxt import graph_from_prototxt

CTX = Context(train=False)


def test_tail_prototxt_imports_and_runs():
    """Log -> PReLU -> Bias -> Normalize -> SPP -> Reduction chain imports
    from prototxt and runs; log/normalize outputs are exact."""
    g = graph_from_prototxt("""
name: "tail2"
input: "data" input_dim: 2 input_dim: 3 input_dim: 8 input_dim: 8
layer { name: "lg" type: "Log" bottom: "data" top: "lg"
  log_param { base: 10 scale: 2 shift: 5 } }
layer { name: "pr" type: "PReLU" bottom: "lg" top: "pr" }
layer { name: "bi" type: "Bias" bottom: "pr" top: "bi" bias_param { axis: 1 } }
layer { name: "nm" type: "Normalize" bottom: "bi" top: "nm" }
layer { name: "spp" type: "SPP" bottom: "nm" top: "spp"
  spp_param { pyramid_height: 3 } }
layer { name: "rd" type: "Reduction" bottom: "spp" top: "rd"
  reduction_param { operation: MEAN axis: 1 } }
""")
    prog = Program(g, train=False)
    x = np.abs(np.random.default_rng(0).standard_normal((2, 8, 8, 3))
               ).astype(np.float32) + 1
    params, state = prog.init(jax.random.PRNGKey(0), {"data": x})
    outs, _ = prog.apply(params, state, {"data": x}, capture=["lg", "nm", "spp"])
    assert outs["spp"].shape == (2, 3 * (1 + 4 + 16))
    assert outs["rd"].shape == (2,)
    lg = np.log(5 + 2 * x) / np.log(10)
    npt.assert_allclose(np.asarray(outs["lg"]), lg, rtol=2e-5)
    want = lg / np.sqrt((lg ** 2).reshape(2, -1).sum(1))[:, None, None, None]
    npt.assert_allclose(np.asarray(outs["nm"]), want, rtol=2e-5)


def test_prelu_negative_slope_and_shared():
    x = jnp.asarray([[-2.0, 3.0], [-1.0, -4.0]])
    spec = LayerSpec("l", "prelu", ("x",), ("y",), {})
    (y,), _ = get_impl("prelu").apply(
        spec, {"slope": jnp.asarray([0.5, 0.1])}, {}, [x], CTX)
    npt.assert_allclose(np.asarray(y), [[-1.0, 3.0], [-0.5, -0.4]])
    spec_sh = LayerSpec("l", "prelu", ("x",), ("y",), {"channel_shared": True})
    specs = get_impl("prelu").param_specs(spec_sh, [(2, 2)])
    assert specs["slope"][0] == (1,)


def test_bias_two_bottom_batched():
    """Bias with a second bottom at axis 0: per-item bias."""
    x = jnp.ones((2, 3, 3, 4))
    b = jnp.asarray([1.0, -1.0])
    spec = LayerSpec("l", "bias", ("x", "b"), ("y",), {"axis": 0})
    (y,), _ = get_impl("bias").apply(spec, {}, {}, [x, b], CTX)
    npt.assert_allclose(np.asarray(y)[0], 2.0)
    npt.assert_allclose(np.asarray(y)[1], 0.0)


class TestBatchReduction:
    """batch_reduction_layer.cpp (TSN fork)."""

    def _phys(self, shape, seed=1):
        return np.random.default_rng(seed).standard_normal(shape).astype(
            np.float32)

    def test_global_mean(self):
        phys = self._phys((2, 8, 3))  # logical (2, 3, 8)
        spec = LayerSpec("l", "batchreduction", ("x",), ("y",),
                         {"reduction_param": {"operation": "MEAN", "axis": 2},
                          "level": [1]})
        (y,), _ = get_impl("batchreduction").apply(
            spec, {}, {}, [jnp.asarray(phys)], CTX)
        npt.assert_allclose(np.asarray(y), phys.transpose(0, 2, 1).mean(2),
                            rtol=1e-5)

    def test_topk(self):
        phys = self._phys((2, 8, 3))
        spec = LayerSpec("l", "batchreduction", ("x",), ("y",),
                         {"reduction_param": {"operation": "TOPK", "axis": 2,
                                              "k": 3}})
        (y,), _ = get_impl("batchreduction").apply(
            spec, {}, {}, [jnp.asarray(phys)], CTX)
        want = np.sort(phys.transpose(0, 2, 1), axis=2)[:, :, -3:].mean(2)
        npt.assert_allclose(np.asarray(y), want, rtol=1e-5)

    def test_levels(self):
        """levels [1, 2] -> ticks [1, 4] cover axis 5; output gains a
        2-long level dim in place of the axis (:54-63)."""
        phys = self._phys((2, 5, 3), seed=2)  # logical (2, 3, 5)
        spec = LayerSpec("l", "batchreduction", ("x",), ("y",),
                         {"reduction_param": {"operation": "SUM", "axis": 2},
                          "level": [1, 2]})
        (y,), _ = get_impl("batchreduction").apply(
            spec, {}, {}, [jnp.asarray(phys)], CTX)
        lg = phys.transpose(0, 2, 1)
        want = np.stack([lg[:, :, :1].sum(2), lg[:, :, 1:5].sum(2)], axis=2)
        npt.assert_allclose(np.asarray(y), want.transpose(0, 2, 1), rtol=1e-5)

    def test_pos_diagonal(self):
        """pos mode sums the (t, t) diagonal of (axis, axis+1) (:125-129)."""
        phys = self._phys((2, 4, 4), seed=3)
        x = jnp.asarray(phys)  # rank-3: logical = (2, 4, 4) after moveaxis
        spec = LayerSpec("l", "batchreduction", ("x",), ("y",),
                         {"reduction_param": {"operation": "SUM", "axis": 1},
                          "pos": True})
        (y,), _ = get_impl("batchreduction").apply(spec, {}, {}, [x], CTX)
        logical = np.moveaxis(phys, -1, 1)
        want = np.trace(logical, axis1=1, axis2=2)
        npt.assert_allclose(np.asarray(y), want, rtol=1e-5)

    def test_levels_must_cover_axis(self):
        spec = LayerSpec("l", "batchreduction", ("x",), ("y",),
                         {"reduction_param": {"axis": 2}, "level": [2]})
        with pytest.raises(ValueError, match="do not cover"):
            get_impl("batchreduction").apply(
                spec, {}, {}, [jnp.zeros((1, 5, 2))], CTX)


def _roi_brute(fm, roi, ph_n, pw_n, scale):
    """Transliteration of roi_pooling_layer.cpp:88-116."""
    def c_round(v):  # C round(): half away from zero (not Python banker's)
        return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

    b = int(roi[0])
    sw = c_round(roi[1] * scale); sh = c_round(roi[2] * scale)
    ew = c_round(roi[3] * scale); eh = c_round(roi[4] * scale)
    rh = max(eh - sh + 1, 1); rw = max(ew - sw + 1, 1)
    H, W, C = fm.shape[1], fm.shape[2], fm.shape[3]
    out = np.zeros((ph_n, pw_n, C), np.float32)
    for ph in range(ph_n):
        for pw in range(pw_n):
            hs = min(max(int(math.floor(ph * rh / ph_n)) + sh, 0), H)
            he = min(max(int(math.ceil((ph + 1) * rh / ph_n)) + sh, 0), H)
            ws = min(max(int(math.floor(pw * rw / pw_n)) + sw, 0), W)
            we = min(max(int(math.ceil((pw + 1) * rw / pw_n)) + sw, 0), W)
            if he <= hs or we <= ws:
                continue
            out[ph, pw] = fm[b, hs:he, ws:we].max(axis=(0, 1))
    return out


@pytest.mark.parametrize("scale", [1.0, 0.5])
def test_roi_pool_matches_reference_loops(scale):
    from eco_tpu.ops import roi_max_pool

    fm = np.random.default_rng(3).standard_normal((2, 9, 11, 4)).astype(
        np.float32)
    rois = np.array([[0, 1, 2, 8, 6], [1, 0, 0, 10, 8], [0, 5, 5, 5, 5]],
                    np.float32)
    out = np.asarray(roi_max_pool(
        jnp.asarray(fm), jnp.asarray(rois), pooled_h=3, pooled_w=3,
        spatial_scale=scale,
    ))
    for i in range(len(rois)):
        npt.assert_allclose(out[i], _roi_brute(fm, rois[i], 3, 3, scale),
                            rtol=1e-5)


def test_smooth_l1_loss():
    """f(x) = 0.5 x^2 (|x|<1) else |x|-0.5; sum/N; optional weights
    (smooth_L1_loss_layer.cu:13-50)."""
    a = jnp.asarray([[0.5, 2.0], [-3.0, 0.1]])
    b = jnp.zeros((2, 2))
    w = jnp.asarray([[1.0, 0.0], [1.0, 2.0]])
    spec = LayerSpec("l", "smoothl1loss", ("a", "b"), ("y",), {})
    (loss,), _ = get_impl("smoothl1loss").apply(spec, {}, {}, [a, b], CTX)
    want = (0.125 + 1.5 + 2.5 + 0.005) / 2
    npt.assert_allclose(float(loss), want, rtol=1e-6)
    spec3 = LayerSpec("l", "smoothl1loss", ("a", "b", "w"), ("y",), {})
    (loss3,), _ = get_impl("smoothl1loss").apply(
        spec3, {}, {}, [a, b, w], CTX)
    want3 = (0.125 + 0.0 + 2.5 + 0.5 * 0.04) / 2
    npt.assert_allclose(float(loss3), want3, rtol=1e-6)


def test_filter_declared_unsupported():
    spec = LayerSpec("l", "filter", ("x", "sel"), ("y",), {})
    with pytest.raises(NotImplementedError, match="static shapes"):
        get_impl("filter").apply(spec, {}, {}, [jnp.zeros((2, 2))] * 2, CTX)


def test_every_reference_layer_has_an_equivalent():
    """Every layer in the reference's src/caffe/layers/ directory maps to an
    executable impl, a data source, or a documented substitution.  Engine
    variants (cudnn_*) and base classes are the same op; sync_bn is the BN
    axis_name path; the LMDB 'data' layer is the documented drop
    (PARITY.md)."""
    reference_layers = {
        # src/caffe/layers/*.{cpp,cu} basenames, engine/base variants folded
        "absval": "absval", "accuracy": "accuracy", "argmax": "argmax",
        "batch_reduction": "batchreduction", "bias": "bias", "bn": "bn",
        "bnll": "bnll", "concat": "concat",
        "contrastive_loss": "contrastiveloss", "conv": "convolution",
        "deconv": "deconvolution", "dropout": "dropout",
        "dummy_data": "dummydata", "eltwise": "eltwise",
        "euclidean_loss": "euclideanloss", "exp": "exp", "filter": "filter",
        "flatten": "flatten", "gather": "gather", "hdf5_output": "hdf5output",
        "hinge_loss": "hingeloss", "im2col": "im2col",
        "infogain_loss": "infogainloss", "inner_product": "innerproduct",
        "log": "log", "lrn": "lrn",
        "multinomial_logistic_loss": "multinomiallogisticloss", "mvn": "mvn",
        "normalize": "normalize", "permute": "permute", "pooling": "pooling",
        "power": "power", "prelu": "prelu", "reduction": "reduction",
        "relu": "relu", "reshape": "reshape", "roi_pooling": "roipooling",
        "scale": "scale", "scatter": "scatter", "sigmoid": "sigmoid",
        "sigmoid_cross_entropy_loss": "sigmoidcrossentropyloss",
        "silence": "silence", "slice": "slice",
        "smooth_L1_loss": "smoothl1loss", "softmax": "softmax",
        "softmax_loss": "softmaxwithloss", "split": "split", "spp": "spp",
        "sync_bn": "bn",  # axis_name/pjit global-moment path of ops.norm
        "tanh": "tanh", "threshold": "threshold",
    }
    data_layers = {
        "base_data": "input", "data": "data", "hdf5_data": "hdf5data",
        "image_data": "imagedata", "memory_data": "memorydata",
        "seg_data": "segdata", "video_data": "videodata",
        "window_data": "windowdata",
    }
    for ref, ours in reference_layers.items():
        assert ours in IMPLS, f"{ref} -> {ours} missing from IMPLS"
    for ref, ours in data_layers.items():
        assert ours in DATA_LAYER_TYPES, f"{ref} -> {ours} not a data type"


def test_reduction_output_is_physical_channels_last():
    """Review fix: Reduction must return physical layout like every layer.
    axis=3 on logical (N,C,H,W) -> logical (N,C,H) -> physical (N,H,C)."""
    phys = np.arange(24, dtype=np.float32).reshape(1, 4, 2, 3)  # (N,H,W,C)
    spec = LayerSpec("l", "reduction", ("x",), ("y",),
                     {"operation": "sum", "axis": 3})
    (y,), _ = get_impl("reduction").apply(
        spec, {}, {}, [jnp.asarray(phys)], CTX)
    logical = np.moveaxis(phys, -1, 1)          # (N,C,H,W)
    want_logical = logical.sum(axis=3)          # (N,C,H)
    npt.assert_allclose(np.asarray(y), np.moveaxis(want_logical, 1, -1))


def test_batch_reduction_asum_raises_like_reference():
    spec = LayerSpec("l", "batchreduction", ("x",), ("y",),
                     {"reduction_param": {"operation": "ASUM", "axis": 1}})
    with pytest.raises(NotImplementedError, match="NOT_IMPLEMENTED"):
        get_impl("batchreduction").apply(
            spec, {}, {}, [jnp.ones((1, 3))], CTX)


def test_batch_reduction_pos_rank_check():
    spec = LayerSpec("l", "batchreduction", ("x",), ("y",),
                     {"reduction_param": {"operation": "SUM", "axis": 1},
                      "pos": True})
    with pytest.raises(ValueError, match="logical dims"):
        get_impl("batchreduction").apply(spec, {}, {}, [jnp.ones((2, 3))], CTX)


def test_roi_pooling_requires_pooled_dims():
    spec = LayerSpec("l", "roipooling", ("x", "rois"), ("y",), {})
    with pytest.raises(ValueError, match="pooled_h/pooled_w"):
        get_impl("roipooling").apply(
            spec, {}, {}, [jnp.ones((1, 4, 4, 2)), jnp.zeros((1, 5))], CTX)


def test_spp_rejects_oversized_pyramid():
    """bins > feature dim would silently change the concat length; the
    reference's pad<kernel CHECK aborts -- so do we."""
    spec = LayerSpec("l", "spp", ("x",), ("y",), {"pyramid_height": 4})
    with pytest.raises(ValueError, match="exceed"):
        get_impl("spp").apply(spec, {}, {}, [jnp.ones((1, 6, 6, 2))], CTX)
