"""Exhaustive-style gradient checker over the layer registry.

Mirrors the reference's GradientChecker / CheckGradientExhaustive
(include/caffe/test/test_gradient_check_util.hpp:19-60), which is the
workhorse of its 67-file layer test suite: perturb each parameter and
input with a central finite difference and compare against the analytic
backward.  Here the analytic side is jax.grad through the SAME LayerImpl
code paths the Program executor runs; sampling a handful of coordinates
per tensor keeps it fast while covering every differentiable layer type.

Kink handling (the reference's `kink` machinery for ReLU/max): inputs are
nudged away from non-smooth points before checking.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eco_tpu.runtime.executor import Context, get_impl
from eco_tpu.spec.graph import LayerSpec

EPS = 1e-3
TOL = 2e-2  # relative, like the reference's threshold_ * scale
RNG = np.random.default_rng(42)


def _away_from_kinks(x, margin=0.05):
    """Push values away from 0 (ReLU kink) and from near-ties (max kinks)."""
    x = np.where(np.abs(x) < margin, margin * np.sign(x) + (x == 0) * margin, x)
    return x


def _sample_coords(shape, k=4):
    idxs = []
    total = int(np.prod(shape))
    for flat in RNG.choice(total, size=min(k, total), replace=False):
        idxs.append(np.unravel_index(int(flat), shape))
    return idxs


def check_layer(spec: LayerSpec, in_shapes, *, train=False, seed=0,
                sep_inputs=True, tol=TOL):
    """FD-vs-analytic gradient agreement for one layer type."""
    impl = get_impl(spec.type)
    rng = np.random.default_rng(seed)
    ins = [
        jnp.asarray(_away_from_kinks(rng.standard_normal(s)), jnp.float32)
        for s in in_shapes
    ]
    pspecs = impl.param_specs(spec, [tuple(s) for s in in_shapes])
    params = {
        pname: jnp.asarray(rng.standard_normal(shape) * 0.5, jnp.float32)
        for pname, (shape, dtype, filler) in pspecs.items()
    }
    sspecs = impl.state_specs(spec, [tuple(s) for s in in_shapes])
    state = {
        sname: jnp.full(shape, val, jnp.float32)
        for sname, (shape, dtype, val) in sspecs.items()
    }
    ctx = Context(train=train, rng=jax.random.PRNGKey(3))
    # random but fixed cotangent so every output coordinate matters
    probe = None

    def loss(params, ins):
        outs, _ = impl.apply(spec, params, state, list(ins), ctx)
        nonlocal probe
        flat = jnp.concatenate(
            [o.astype(jnp.float32).reshape(-1) for o in outs
             if hasattr(o, "dtype") and jnp.issubdtype(o.dtype, jnp.floating)]
        )
        if probe is None:
            probe = jnp.asarray(
                np.random.default_rng(7).standard_normal(flat.shape[0]),
                jnp.float32,
            )
        return jnp.sum(flat * probe)

    g_params, g_ins = jax.grad(loss, argnums=(0, 1))(params, ins)

    def fd(getter, setter, base):
        analytic_v_numeric = []
        for coords in _sample_coords(np.shape(base)):
            orig = float(np.asarray(base)[coords])
            hi = np.asarray(base).copy(); hi[coords] = orig + EPS
            lo = np.asarray(base).copy(); lo[coords] = orig - EPS
            fhi = float(loss(*setter(jnp.asarray(hi))))
            flo = float(loss(*setter(jnp.asarray(lo))))
            numeric = (fhi - flo) / (2 * EPS)
            analytic = float(np.asarray(getter())[coords])
            analytic_v_numeric.append((analytic, numeric))
        return analytic_v_numeric

    pairs = []
    for pname in params:
        pairs += fd(
            lambda pname=pname: g_params[pname],
            lambda v, pname=pname: ({**params, pname: v}, ins),
            params[pname],
        )
    if sep_inputs:
        for i in range(len(ins)):
            pairs += fd(
                lambda i=i: g_ins[i],
                lambda v, i=i: (params, [*ins[:i], v, *ins[i + 1:]]),
                ins[i],
            )
    for analytic, numeric in pairs:
        scale = max(abs(analytic), abs(numeric), 1.0)
        assert abs(analytic - numeric) <= tol * scale, (
            spec.type, analytic, numeric)


CASES = [
    ("convolution", LayerSpec("l", "convolution", ("x",), ("y",),
        {"num_output": 6, "kernel_size": 3, "stride": 1, "pad": 1,
         "bias_term": True}), [(2, 7, 7, 4)]),
    ("convolution3d", LayerSpec("l", "convolution", ("x",), ("y",),
        {"num_output": 4, "kernel_size": 3, "stride": 1, "pad": 1}),
        [(1, 4, 6, 6, 3)]),
    ("conv_grouped", LayerSpec("l", "convolution", ("x",), ("y",),
        {"num_output": 4, "kernel_size": 3, "pad": 1, "group": 2}),
        [(2, 6, 6, 4)]),
    ("deconvolution", LayerSpec("l", "deconvolution", ("x",), ("y",),
        {"num_output": 3, "kernel_size": 4, "stride": 2, "pad": 1}),
        [(1, 5, 5, 4)]),
    ("innerproduct", LayerSpec("l", "innerproduct", ("x",), ("y",),
        {"num_output": 5}), [(3, 4, 4, 2)]),
    ("bn_train", LayerSpec("l", "bn", ("x",), ("y",), {}), [(4, 5, 5, 3)]),
    ("scale", LayerSpec("l", "scale", ("x",), ("y",), {}), [(2, 5, 5, 3)]),
    ("eltwise_sum", LayerSpec("l", "eltwise", ("a", "b"), ("y",),
        {"operation": "sum", "coeffs": [0.7, -1.3]}),
        [(2, 4, 4, 3), (2, 4, 4, 3)]),
    ("eltwise_prod", LayerSpec("l", "eltwise", ("a", "b"), ("y",),
        {"operation": "prod"}), [(2, 4, 4, 3), (2, 4, 4, 3)]),
    ("eltwise_max", LayerSpec("l", "eltwise", ("a", "b"), ("y",),
        {"operation": "max"}), [(2, 4, 4, 3), (2, 4, 4, 3)]),
    ("pool_ave", LayerSpec("l", "pooling", ("x",), ("y",),
        {"pool": "ave", "kernel_size": 3, "stride": 2}), [(2, 7, 7, 3)]),
    ("pool_max", LayerSpec("l", "pooling", ("x",), ("y",),
        {"pool": "max", "kernel_size": 2, "stride": 2}), [(2, 6, 6, 3)]),
    ("relu", LayerSpec("l", "relu", ("x",), ("y",), {}), [(2, 5, 5, 3)]),
    ("lrn", LayerSpec("l", "lrn", ("x",), ("y",),
        {"local_size": 3, "alpha": 1e-2, "beta": 0.75}), [(2, 5, 5, 4)]),
    ("concat", LayerSpec("l", "concat", ("a", "b"), ("y",), {}),
        [(2, 4, 4, 2), (2, 4, 4, 3)]),
    ("dropout_train", LayerSpec("l", "dropout", ("x",), ("y",),
        {"dropout_ratio": 0.4}), [(3, 4, 4, 2)]),
    ("deconv_grouped", LayerSpec("l", "deconvolution", ("x",), ("y",),
        {"num_output": 4, "kernel_size": 3, "stride": 2, "pad": 1,
         "group": 2}), [(1, 5, 5, 4)]),
    ("bnll", LayerSpec("l", "bnll", ("x",), ("y",), {}), [(2, 5, 5, 3)]),
    ("mvn", LayerSpec("l", "mvn", ("x",), ("y",), {}), [(2, 5, 5, 3)]),
    ("mvn_across", LayerSpec("l", "mvn", ("x",), ("y",),
        {"across_channels": True, "normalize_variance": False}),
        [(2, 5, 5, 3)]),
    ("im2col", LayerSpec("l", "im2col", ("x",), ("y",),
        {"kernel_size": 3, "stride": 2, "pad": 1}), [(2, 7, 7, 3)]),
    ("log", LayerSpec("l", "log", ("x",), ("y",),
        {"base": 10.0, "scale": 2.0, "shift": 5.0}), [(2, 4, 4, 3)]),
    ("prelu", LayerSpec("l", "prelu", ("x",), ("y",), {}), [(2, 4, 4, 3)]),
    ("bias", LayerSpec("l", "bias", ("x",), ("y",), {"axis": 1}),
        [(2, 4, 4, 3)]),
    ("reduction_mean", LayerSpec("l", "reduction", ("x",), ("y",),
        {"operation": "mean", "axis": 1, "coeff": 2.0}), [(2, 4, 4, 3)]),
    ("normalize", LayerSpec("l", "normalize", ("x",), ("y",), {}),
        [(2, 4, 4, 3)]),
    ("batchreduction_topk", LayerSpec("l", "batchreduction", ("x",), ("y",),
        {"reduction_param": {"operation": "TOPK", "axis": 2, "k": 2}}),
        [(2, 6, 3)]),
    ("spp", LayerSpec("l", "spp", ("x",), ("y",),
        {"pyramid_height": 2, "pool": "ave"}), [(2, 6, 6, 3)]),
]


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_layer_gradients(case):
    name, spec, shapes = case
    train = name.endswith("_train")
    # max-pool: well-separated values avoid FD stepping across the argmax
    tol = 5e-2 if name in ("pool_max", "eltwise_max") else TOL
    check_layer(spec, shapes, train=train, tol=tol)


def test_softmax_loss_gradient():
    spec = LayerSpec("l", "softmaxwithloss", ("x", "label"), ("loss",), {})
    impl = get_impl(spec.type)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 5)), jnp.float32)
    label = jnp.asarray(rng.integers(0, 5, (4,)))
    ctx = Context(train=True, rng=None)

    def loss(x):
        outs, _ = impl.apply(spec, {}, {}, [x, label], ctx)
        return outs[0].astype(jnp.float32).sum()

    g = jax.grad(loss)(x)
    for coords in _sample_coords(x.shape, k=6):
        hi = np.asarray(x).copy(); hi[coords] += EPS
        lo = np.asarray(x).copy(); lo[coords] -= EPS
        numeric = (float(loss(jnp.asarray(hi))) - float(loss(jnp.asarray(lo)))) / (2 * EPS)
        analytic = float(np.asarray(g)[coords])
        assert abs(analytic - numeric) <= TOL * max(abs(analytic), abs(numeric), 1.0)
