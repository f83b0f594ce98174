"""Op-level parity tests against independent references (torch CPU / numpy).

Mirrors the reference's gradient-checked layer tests
(caffe_3d/src/caffe/test/test_convolution_layer.cpp etc.) but with torch as
the independent oracle and jax.grad for analytic/numeric agreement.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from eco_tpu import ops

RNG = np.random.default_rng(0)


def _np(x):
    return np.asarray(x)


# ---------------------------------------------------------------- conv


@pytest.mark.parametrize(
    "cin,cout,k,s,p,hw",
    [(3, 8, 3, 1, 1, 14), (8, 16, 7, 2, 3, 28), (4, 4, 1, 1, 0, 9), (6, 8, 3, 2, 1, 15)],
)
def test_conv2d_matches_torch(cin, cout, k, s, p, hw):
    x = RNG.standard_normal((2, hw, hw, cin), dtype=np.float32)
    w = RNG.standard_normal((k, k, cin, cout), dtype=np.float32) * 0.1
    b = RNG.standard_normal((cout,), dtype=np.float32)
    y = ops.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=s, pad=p)
    ref = F.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(w).permute(3, 2, 0, 1),
        torch.from_numpy(b),
        stride=s,
        padding=p,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(_np(y), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("s", [1, 2])
def test_conv3d_matches_torch(s):
    x = RNG.standard_normal((2, 8, 10, 10, 6), dtype=np.float32)
    w = RNG.standard_normal((3, 3, 3, 6, 12), dtype=np.float32) * 0.1
    y = ops.conv3d(jnp.asarray(x), jnp.asarray(w), stride=s, pad=1)
    ref = F.conv3d(
        torch.from_numpy(x).permute(0, 4, 1, 2, 3),
        torch.from_numpy(w).permute(4, 3, 0, 1, 2),
        stride=s,
        padding=1,
    ).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(_np(y), ref, rtol=3e-4, atol=3e-4)


def test_grouped_conv_matches_torch():
    x = RNG.standard_normal((2, 8, 8, 8), dtype=np.float32)
    w = RNG.standard_normal((3, 3, 4, 16), dtype=np.float32) * 0.1
    y = ops.conv2d(jnp.asarray(x), jnp.asarray(w), stride=1, pad=1, groups=2)
    ref = F.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(w).permute(3, 2, 0, 1),
        stride=1,
        padding=1,
        groups=2,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(_np(y), ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------- pooling


def _caffe_pool_ref(x_nchw, k, s, p, mode):
    """Literal transcription of the Caffe pooling formulas as a numpy oracle
    (semantics of reference pooling_layer.cpp:84-170, re-derived)."""
    n, c, h, w = x_nchw.shape
    import math

    def odim(size, kk):
        out = int(math.ceil((size + 2 * p - kk) / s)) + 1
        if p > 0 and (out - 1) * s >= size + p:
            out -= 1
        return out

    kh, kw = (k, k) if isinstance(k, int) else k
    ph, pw = odim(h, kh), odim(w, kw)
    out = np.zeros((n, c, ph, pw), dtype=np.float32)
    for i in range(ph):
        for j in range(pw):
            hs, ws = i * s - p, j * s - p
            he, we = min(hs + kh, h + p), min(ws + kw, w + p)
            pool_size = (he - hs) * (we - ws)
            hs_, ws_ = max(hs, 0), max(ws, 0)
            he_, we_ = min(he, h), min(we, w)
            window = x_nchw[:, :, hs_:he_, ws_:we_]
            if mode == "max":
                out[:, :, i, j] = window.max(axis=(2, 3))
            else:
                out[:, :, i, j] = window.sum(axis=(2, 3)) / pool_size
    return out


@pytest.mark.parametrize(
    "mode,k,s,p,hw",
    [
        ("max", 3, 2, 0, 112),  # pool1_3x3_s2 (ceil mode: 112 -> 56)
        ("max", 3, 2, 0, 28),
        ("ave", 3, 1, 1, 28),  # inception avg pool branches
        ("max", 3, 2, 1, 15),
        ("ave", 3, 2, 1, 15),
        ("ave", 7, 1, 0, 7),  # global_pool2D
    ],
)
def test_pool2d_matches_caffe_semantics(mode, k, s, p, hw):
    x = RNG.standard_normal((2, 5, hw, hw), dtype=np.float32)
    got = ops.pool_nd(
        jnp.asarray(np.moveaxis(x, 1, -1)), kernel=k, stride=s, pad=p, mode=mode
    )
    ref = _caffe_pool_ref(x, k, s, p, mode)
    np.testing.assert_allclose(np.moveaxis(_np(got), -1, 1), ref, rtol=1e-5, atol=1e-5)


def test_pool_ceil_mode_shape():
    # 112 -> ceil((112-3)/2)+1 = 56 (floor would give 55 remainder handling)
    x = jnp.zeros((1, 112, 112, 4))
    assert ops.max_pool(x, 3, 2, 0).shape == (1, 56, 56, 4)
    x = jnp.zeros((1, 56, 56, 4))
    assert ops.max_pool(x, 3, 2, 0).shape == (1, 28, 28, 4)


def test_global_pool_3d():
    x = RNG.standard_normal((2, 4, 7, 7, 512), dtype=np.float32)
    got = ops.pool_nd(jnp.asarray(x), global_pooling=True, mode="ave")
    assert got.shape == (2, 1, 1, 1, 512)
    np.testing.assert_allclose(
        _np(got)[:, 0, 0, 0], x.mean(axis=(1, 2, 3)), rtol=1e-5, atol=1e-6
    )
    short = ops.global_avg_pool(jnp.asarray(x))
    np.testing.assert_allclose(_np(short), x.mean(axis=(1, 2, 3)), rtol=1e-5, atol=1e-6)


def test_segment_consensus_pool_shape():
    # ECO-Full: logical (N,1,16,1024) pooled with kernel (16,1) -> (N,1,1,1024).
    x = RNG.standard_normal((3, 16, 1024, 1), dtype=np.float32)  # physical layout
    got = ops.pool_nd(jnp.asarray(x), kernel=(16, 1), stride=1, pad=0, mode="ave")
    assert got.shape == (3, 1, 1024, 1)
    np.testing.assert_allclose(_np(got)[:, 0, :, 0], x.mean(axis=1)[..., 0], rtol=1e-5)


# ---------------------------------------------------------------- BN


def test_bn_inference_matches_torch():
    x = RNG.standard_normal((4, 9, 9, 16), dtype=np.float32)
    g = RNG.standard_normal((16,), dtype=np.float32)
    b = RNG.standard_normal((16,), dtype=np.float32)
    m = RNG.standard_normal((16,), dtype=np.float32)
    v = RNG.random((16,), dtype=np.float32) + 0.5
    got = ops.bn_inference(*map(jnp.asarray, (x, g, b, m, v)))
    ref = F.batch_norm(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(m),
        torch.from_numpy(v),
        torch.from_numpy(g),
        torch.from_numpy(b),
        training=False,
        eps=1e-5,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(_np(got), ref, rtol=1e-4, atol=1e-4)


def test_bn_train_moments_and_ema():
    x = RNG.standard_normal((8, 5, 5, 6), dtype=np.float32)
    g = np.ones((6,), np.float32)
    b = np.zeros((6,), np.float32)
    rm = np.full((6,), 2.0, np.float32)
    rv = np.full((6,), 3.0, np.float32)
    y, nm, nv = ops.bn_train(*map(jnp.asarray, (x, g, b, rm, rv)))
    batch_mean = x.mean(axis=(0, 1, 2))
    batch_var = (x**2).mean(axis=(0, 1, 2)) - batch_mean**2  # biased
    # EMA: new = 0.1*batch + 0.9*old (bn_layer.cpp:120-121 with momentum 0.9)
    np.testing.assert_allclose(_np(nm), 0.1 * batch_mean + 0.9 * rm, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_np(nv), 0.1 * batch_var + 0.9 * rv, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_np(y).mean(axis=(0, 1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(_np(y).var(axis=(0, 1, 2)), 1.0, rtol=1e-2)


def test_bn_fold_equivalence():
    x = RNG.standard_normal((2, 7, 7, 8), dtype=np.float32)
    w = RNG.standard_normal((3, 3, 8, 12), dtype=np.float32) * 0.2
    bias = RNG.standard_normal((12,), dtype=np.float32)
    g = RNG.standard_normal((12,), dtype=np.float32)
    beta = RNG.standard_normal((12,), dtype=np.float32)
    m = RNG.standard_normal((12,), dtype=np.float32)
    v = RNG.random((12,), dtype=np.float32) + 0.3
    xj = jnp.asarray(x)
    y_ref = ops.bn_inference(
        ops.conv2d(xj, jnp.asarray(w), jnp.asarray(bias), pad=1),
        *map(jnp.asarray, (g, beta, m, v)),
    )
    scale, shift = ops.fold_scale_shift(*map(jnp.asarray, (g, beta, m, v)))
    w_f = jnp.asarray(w) * scale[None, None, None, :]
    b_f = jnp.asarray(bias) * scale + shift
    y_fold = ops.conv2d(xj, w_f, b_f, pad=1)
    np.testing.assert_allclose(_np(y_fold), _np(y_ref), rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------- misc ops


def test_dropout_train_scaling_and_test_identity():
    x = jnp.ones((1000, 16))
    y = ops.dropout(x, 0.3, train=True, rng=jax.random.PRNGKey(0))
    kept = _np(y) != 0
    assert abs(kept.mean() - 0.7) < 0.03
    np.testing.assert_allclose(_np(y)[kept], 1.0 / 0.7, rtol=1e-6)
    assert ops.dropout(x, 0.3, train=False) is x


def test_eltwise_modes():
    a = jnp.asarray(RNG.standard_normal((3, 4)).astype(np.float32))
    b = jnp.asarray(RNG.standard_normal((3, 4)).astype(np.float32))
    np.testing.assert_allclose(_np(ops.eltwise([a, b], "sum")), _np(a) + _np(b))
    np.testing.assert_allclose(_np(ops.eltwise([a, b], "prod")), _np(a) * _np(b))
    np.testing.assert_allclose(
        _np(ops.eltwise([a, b], "max")), np.maximum(_np(a), _np(b))
    )
    np.testing.assert_allclose(
        _np(ops.eltwise([a, b], "sum", coeffs=[2.0, -1.0])), 2 * _np(a) - _np(b)
    )
    # STOCHASTIC_SUM at TEST = coeff-weighted sum (eltwise_layer.cpp:112-116)
    np.testing.assert_allclose(
        _np(ops.eltwise([a, b], "stochastic_sum", train=False)),
        _np(a) + _np(b),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        _np(ops.eltwise([a, b], "stochastic_sum", coeffs=[0.5, 2.0], train=False)),
        0.5 * _np(a) + 2.0 * _np(b),
        rtol=1e-6,
    )
    # TRAIN: each bottom gated independently with prob coeff[i]
    got = _np(ops.eltwise([a, b], "stochastic_sum", coeffs=[1.0, 0.0],
                          train=True, rng=jax.random.PRNGKey(0)))
    np.testing.assert_allclose(got, _np(a), rtol=1e-6)


def test_softmax_loss_and_accuracy():
    logits = jnp.asarray(RNG.standard_normal((6, 10)).astype(np.float32))
    labels = jnp.asarray([0, 3, 9, 1, 1, 7])
    loss = ops.softmax_cross_entropy(logits, labels)
    ref = F.cross_entropy(
        torch.from_numpy(_np(logits)), torch.from_numpy(_np(labels)).long()
    )
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5)
    # ignore_label
    labels_ig = jnp.asarray([0, 3, 9, -1, -1, 7])
    loss_ig = ops.softmax_cross_entropy(logits, labels_ig, ignore_label=-1)
    ref_ig = F.cross_entropy(
        torch.from_numpy(_np(logits)), torch.from_numpy(_np(labels_ig)).long(),
        ignore_index=-1,
    )
    np.testing.assert_allclose(float(loss_ig), float(ref_ig), rtol=1e-5)
    acc1 = ops.topk_accuracy(logits, labels, 1)
    acc5 = ops.topk_accuracy(logits, labels, 5)
    ref_top1 = (_np(logits).argmax(-1) == _np(labels)).mean()
    np.testing.assert_allclose(float(acc1), ref_top1)
    order = np.argsort(-_np(logits), axis=-1)[:, :5]
    ref_top5 = np.mean([l in o for l, o in zip(_np(labels), order)])
    np.testing.assert_allclose(float(acc5), ref_top5)


def test_segment_layout_roundtrip():
    x = jnp.asarray(RNG.standard_normal((2 * 16, 28, 28, 96)).astype(np.float32))
    folded = ops.unfold_segments(x, 16)
    assert folded.shape == (2, 16, 28, 28, 96)
    np.testing.assert_allclose(_np(ops.fold_segments(folded)), _np(x))
    feats = jnp.asarray(RNG.standard_normal((3 * 4, 1024)).astype(np.float32))
    cons = ops.segment_consensus(feats, 4)
    np.testing.assert_allclose(
        _np(cons), _np(feats).reshape(3, 4, 1024).mean(1), rtol=1e-5
    )


def test_caffe_reshape_dims():
    assert ops.caffe_reshape_dims((34, 48, 224, 224), (-1, 3, 224, 224)) == (
        544, 3, 224, 224,
    )
    assert ops.caffe_reshape_dims((544, 96, 28, 28), (-1, 16, 96, 28, 28)) == (
        34, 16, 96, 28, 28,
    )
    assert ops.caffe_reshape_dims((34, 512, 1, 1, 1), (-1, 512)) == (34, 512)
    assert ops.caffe_reshape_dims((4, 6, 8), (0, -1)) == (4, 48)


def test_conv_gradcheck_against_numeric():
    # The reference gradient-checks every layer (test_gradient_check_util.hpp);
    # here jax.grad vs central differences on a small conv+pool+loss net.
    x = jnp.asarray(RNG.standard_normal((2, 6, 6, 3)).astype(np.float32))
    w = jnp.asarray((RNG.standard_normal((3, 3, 3, 4)) * 0.3).astype(np.float32))
    labels = jnp.asarray([1, 2])

    def f(w):
        y = ops.relu(ops.conv2d(x, w, pad=1))
        y = ops.avg_pool(y, 3, 2, 1)
        y = y.reshape(2, -1)
        return ops.softmax_cross_entropy(y[:, :5], labels)

    g = jax.grad(f)(w)
    eps = 1e-3
    for idx in [(0, 0, 0, 0), (1, 2, 1, 3), (2, 2, 2, 2)]:
        wp = w.at[idx].add(eps)
        wm = w.at[idx].add(-eps)
        num = (f(wp) - f(wm)) / (2 * eps)
        np.testing.assert_allclose(float(g[idx]), float(num), rtol=2e-2, atol=1e-4)


def test_deconv_matches_torch():
    # Caffe/torch ConvTranspose semantics: out = s*(in-1) + k - 2p
    x = RNG.standard_normal((2, 7, 7, 6), dtype=np.float32)
    w = RNG.standard_normal((4, 4, 6, 8), dtype=np.float32) * 0.1  # (k,k,Cin,Cout)
    y = ops.conv_nd(jnp.asarray(x), jnp.asarray(w), stride=2, pad=1,
                    transposed=True)
    ref = F.conv_transpose2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(w).permute(2, 3, 0, 1),  # (Cin, Cout, k, k)
        stride=2, padding=1,
    ).permute(0, 2, 3, 1).numpy()
    assert y.shape == ref.shape == (2, 14, 14, 8)
    np.testing.assert_allclose(_np(y), ref, rtol=3e-4, atol=3e-4)


def test_grouped_deconv_matches_torch():
    # base_conv_layer.cpp:13-188 generalizes groups to deconvolution; our
    # weight layout is (*k, C_in, C_out/g) mirroring Caffe's (C_in, C_out/g, *k).
    x = RNG.standard_normal((2, 5, 5, 6), dtype=np.float32)
    w = RNG.standard_normal((3, 3, 6, 2), dtype=np.float32) * 0.1  # g=2 -> Cout=4
    y = ops.conv_nd(jnp.asarray(x), jnp.asarray(w), stride=2, pad=1,
                    transposed=True, groups=2)
    ref = F.conv_transpose2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(w).permute(2, 3, 0, 1),  # (Cin, Cout/g, k, k)
        stride=2, padding=1, groups=2,
    ).permute(0, 2, 3, 1).numpy()
    assert y.shape == ref.shape == (2, 9, 9, 4)
    np.testing.assert_allclose(_np(y), ref, rtol=3e-4, atol=3e-4)


# ---------------------------------------------------------------------------
# Layer-zoo tail (round-3): threshold/bnll/mvn/stochastic-pool/im2col + losses
# ---------------------------------------------------------------------------


def test_threshold_and_bnll():
    x = jnp.asarray([[-2.0, -0.1, 0.0, 0.1, 3.0]], jnp.float32)
    np.testing.assert_array_equal(
        _np(ops.threshold(x, 0.0)), [[0.0, 0.0, 0.0, 1.0, 1.0]]
    )
    np.testing.assert_array_equal(
        _np(ops.threshold(x, 0.5)), [[0.0, 0.0, 0.0, 0.0, 1.0]]
    )
    # BNLL == log(1+exp(x)), overflow-stable at large |x|
    big = jnp.asarray([[-50.0, 0.0, 50.0]], jnp.float32)
    ref = F.softplus(torch.from_numpy(np.asarray(big))).numpy()
    np.testing.assert_allclose(_np(ops.bnll(big)), ref, rtol=1e-6, atol=1e-6)
    assert np.isfinite(_np(ops.bnll(big))).all()


def test_mvn_matches_reference_formula():
    # mvn_layer.cpp: y = (x - mean) / (sqrt(E[x^2]-E[x]^2) + eps),
    # reduced over H*W per channel (or C*H*W across_channels)
    x = RNG.standard_normal((2, 4, 5, 3)).astype(np.float32) * 2 + 1
    y = _np(ops.mvn(jnp.asarray(x), eps=1e-9))
    for n in range(2):
        for c in range(3):
            sl = x[n, :, :, c]
            ref = (sl - sl.mean()) / (np.sqrt((sl**2).mean() - sl.mean()**2) + 1e-9)
            np.testing.assert_allclose(y[n, :, :, c], ref, rtol=1e-4, atol=1e-5)
    ya = _np(ops.mvn(jnp.asarray(x), across_channels=True))
    sl = x[0]
    ref = (sl - sl.mean()) / (np.sqrt((sl**2).mean() - sl.mean()**2) + 1e-9)
    np.testing.assert_allclose(ya[0], ref, rtol=1e-4, atol=1e-5)
    # normalize_variance=false: mean subtraction only
    ym = _np(ops.mvn(jnp.asarray(x), normalize_variance=False))
    np.testing.assert_allclose(
        ym[0, :, :, 0], x[0, :, :, 0] - x[0, :, :, 0].mean(), rtol=1e-5, atol=1e-5
    )


def test_stochastic_pool_test_mode():
    # StoPoolForwardTest: sum(x^2) / (FLT_MIN + sum(x)) per window, no pad
    x = np.abs(RNG.standard_normal((1, 4, 4, 2))).astype(np.float32)
    y = _np(ops.stochastic_pool(jnp.asarray(x), 2, 2, train=False))
    assert y.shape == (1, 2, 2, 2)
    w = x[0, :2, :2, 0]
    np.testing.assert_allclose(
        y[0, 0, 0, 0], (w**2).sum() / w.sum(), rtol=1e-5
    )


def test_stochastic_pool_train_samples_proportionally():
    # one 1x2 window holding (1, 3): value 3 must be drawn ~3x as often
    x = jnp.asarray(np.array([[[[1.0], [3.0]]]], np.float32))  # (1,1,2,1)
    draws = [
        float(ops.stochastic_pool(x, (1, 2), (1, 2), train=True,
                                  rng=jax.random.PRNGKey(i))[0, 0, 0, 0])
        for i in range(400)
    ]
    assert set(np.round(draws, 5)) <= {1.0, 3.0}
    frac3 = np.mean(np.asarray(draws) == 3.0)
    assert 0.65 <= frac3 <= 0.85, frac3  # expect 0.75


def test_im2col_matches_torch_unfold():
    x = RNG.standard_normal((2, 7, 7, 3)).astype(np.float32)
    y = _np(ops.im2col(jnp.asarray(x), 3, stride=2, pad=1))
    # torch unfold: (N, C*K, L) with channel-major K-minor ordering == Caffe
    ref = F.unfold(
        torch.from_numpy(x).permute(0, 3, 1, 2), kernel_size=3, stride=2,
        padding=1,
    ).numpy()
    n, ck, L = ref.shape
    oh = ow = int(np.sqrt(L))
    ref = ref.reshape(n, ck, oh, ow).transpose(0, 2, 3, 1)
    assert y.shape == ref.shape
    np.testing.assert_allclose(y, ref, rtol=1e-6, atol=1e-6)


def test_hinge_loss_reference_formula():
    # hinge_loss_layer.cpp: negate true-class column, max(0, 1+v), L1/L2
    x = RNG.standard_normal((4, 5)).astype(np.float32)
    labels = np.asarray([0, 2, 4, 1])
    signed = x.copy()
    for i, l in enumerate(labels):
        signed[i, l] *= -1
    m = np.maximum(0.0, 1.0 + signed)
    np.testing.assert_allclose(
        float(ops.hinge_loss(jnp.asarray(x), jnp.asarray(labels))),
        m.sum() / 4, rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(ops.hinge_loss(jnp.asarray(x), jnp.asarray(labels), norm="L2")),
        (m**2).sum() / 4, rtol=1e-5,
    )


def test_sigmoid_cross_entropy_matches_torch():
    x = RNG.standard_normal((3, 6)).astype(np.float32) * 3
    t = (RNG.uniform(size=(3, 6)) > 0.5).astype(np.float32)
    got = float(ops.sigmoid_cross_entropy(jnp.asarray(x), jnp.asarray(t)))
    ref = F.binary_cross_entropy_with_logits(
        torch.from_numpy(x), torch.from_numpy(t), reduction="sum"
    ).item() / 3  # reference divides by outer num, not element count
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    # gradcheck through the stable form
    g = jax.grad(lambda a: ops.sigmoid_cross_entropy(a, jnp.asarray(t)))(
        jnp.asarray(x)
    )
    np.testing.assert_allclose(
        _np(g), (1 / (1 + np.exp(-x)) - t) / 3, rtol=1e-4, atol=1e-5
    )


def test_infogain_loss_identity_is_nll():
    probs = np.abs(RNG.standard_normal((3, 4))).astype(np.float32) + 0.1
    probs /= probs.sum(-1, keepdims=True)
    labels = np.asarray([1, 0, 3])
    H = np.eye(4, dtype=np.float32)
    got = float(ops.infogain_loss(jnp.asarray(probs), jnp.asarray(labels),
                                  jnp.asarray(H)))
    ref = -np.log(probs[np.arange(3), labels]).sum() / 3
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    # off-diagonal H actually weights other columns
    H2 = np.ones((4, 4), np.float32)
    got2 = float(ops.infogain_loss(jnp.asarray(probs), jnp.asarray(labels),
                                   jnp.asarray(H2)))
    ref2 = -np.log(probs).sum() / 3
    np.testing.assert_allclose(got2, ref2, rtol=1e-5)


def test_contrastive_loss_reference_formula():
    a = RNG.standard_normal((4, 6)).astype(np.float32)
    b = RNG.standard_normal((4, 6)).astype(np.float32)
    y = np.asarray([1.0, 0.0, 1.0, 0.0], np.float32)
    d2 = ((a - b) ** 2).sum(-1)
    margin = 1.5
    ref = (y * d2 + (1 - y) * np.maximum(margin - np.sqrt(d2), 0) ** 2).sum() / 8
    got = float(ops.contrastive_loss(jnp.asarray(a), jnp.asarray(b),
                                     jnp.asarray(y), margin=margin))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    ref_legacy = (y * d2 + (1 - y) * np.maximum(margin - d2, 0)).sum() / 8
    got_legacy = float(ops.contrastive_loss(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(y), margin=margin,
        legacy=True))
    np.testing.assert_allclose(got_legacy, ref_legacy, rtol=1e-5)


def test_maxpool_mask_vjp_matches_select_scatter(monkeypatch):
    """The recompute-mask VJP (ECO_POOL_MASK_VJP=1, VERDICT r3 #7) matches
    XLA's select-and-scatter gradient, including tie routing (first match,
    the Caffe single-argmax order) on ReLU-style zero-heavy inputs."""
    import os

    import numpy as np
    import jax
    import jax.numpy as jnp

    from eco_tpu.ops.pool import pool_nd

    def f2d(x):
        return pool_nd(x, kernel=3, stride=2, pad=1, mode="max")

    def f3d(x):
        return pool_nd(x, kernel=(2, 3, 3), stride=(2, 2, 2),
                       pad=(0, 1, 1), mode="max")

    rng = np.random.default_rng(0)
    cases = [
        (f2d, jnp.asarray(rng.standard_normal((2, 13, 13, 4)), jnp.float32)),
        # tie-heavy: integer-quantized relu'd values
        (f2d, jnp.asarray(
            np.maximum(rng.integers(-3, 4, (2, 13, 13, 4)), 0), jnp.float32)),
        (f3d, jnp.asarray(rng.standard_normal((2, 5, 9, 9, 4)), jnp.float32)),
    ]
    for f, x in cases:
        monkeypatch.delenv("ECO_POOL_MASK_VJP", raising=False)
        y0, vjp0 = jax.vjp(f, x)
        monkeypatch.setenv("ECO_POOL_MASK_VJP", "1")
        y1, vjp1 = jax.vjp(f, x)
        assert bool(jnp.all(y0 == y1))
        g = jnp.asarray(rng.standard_normal(y0.shape), jnp.float32)
        a, b = vjp0(g)[0], vjp1(g)[0]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6,
        )
