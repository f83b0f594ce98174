"""Cross-framework golden test: ECO graphs executed by an independent torch
NCHW engine vs our channels-last XLA executor, sharing identical weights.

This is the strongest correctness anchor available without the released
caffemodels (stripped from the checkout, SURVEY.md section 0): torch's conv /
ceil-mode pooling / batch_norm are an independent implementation of the same
Caffe semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from eco_tpu.models import build_eco_full, build_eco_lite
from eco_tpu.runtime import Program

pytestmark = pytest.mark.slow  # compile-heavy: full-model builds

torch.set_grad_enabled(False)


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def torch_execute(program, params, state, data_nchw: dict):
    """Walk program.exec_layers with torch ops on NCHW tensors."""
    blobs = dict(data_nchw)
    for l in program.exec_layers:
        p = params.get(l.name, {})
        s = state.get(l.name, {})
        ins = [blobs[b] for b in l.bottoms]
        t = l.type
        if t == "fold_segments":
            x = ins[0]  # (N, S, C, H, W)
            out = x.reshape(-1, *x.shape[2:])
        elif t == "unfold_segments":
            x = ins[0]  # (N*S, C, H, W)
            S = l.opt("num_segments")
            out = x.reshape(-1, S, *x.shape[1:]).permute(0, 2, 1, 3, 4)
        elif t == "segment_consensus":
            x = ins[0]
            if x.dim() > 2:
                x = x.mean(dim=tuple(range(2, x.dim())))
            S = l.opt("num_segments")
            out = x.reshape(-1, S, x.shape[-1]).mean(1)
        elif t == "convolution":
            w = _t(p["w"])  # (*k, cin, cout) -> (cout, cin, *k)
            nsp = w.dim() - 2
            w = w.permute(-1, -2, *range(nsp))
            b = _t(p["b"]) if "b" in p else None
            stride = l.opt("stride", 1) or 1
            pad = l.opt("pad", 0) or 0
            if isinstance(stride, (list, tuple)):
                stride = tuple(stride)
            if isinstance(pad, (list, tuple)):
                pad = tuple(pad)
            conv = F.conv3d if ins[0].dim() == 5 else F.conv2d
            out = conv(ins[0], w, b, stride=stride, padding=pad,
                       groups=int(l.opt("group", 1)))
        elif t == "bn":
            out = F.batch_norm(
                ins[0], _t(s["mean"]), _t(s["var"]), _t(p["gamma"]),
                _t(p["beta"]), training=False, eps=float(l.opt("eps", 1e-5)),
            )
        elif t == "relu":
            out = F.relu(ins[0])
        elif t == "pooling":
            k = l.opt("kernel_size")
            if isinstance(k, (list, tuple)):
                k = tuple(k)
            stride = l.opt("stride", 1) or 1
            if isinstance(stride, (list, tuple)):
                stride = tuple(stride)
            pad = l.opt("pad", 0) or 0
            mode = l.opt("pool", "max")
            nd = ins[0].dim() - 2
            if mode == "max":
                fn = F.max_pool3d if nd == 3 else F.max_pool2d
                out = fn(ins[0], k, stride, pad, ceil_mode=True)
            else:
                fn = F.avg_pool3d if nd == 3 else F.avg_pool2d
                out = fn(ins[0], k, stride, pad, ceil_mode=True,
                         count_include_pad=True)
        elif t == "global_avg_pool":
            out = ins[0].mean(dim=tuple(range(2, ins[0].dim())))
        elif t == "innerproduct":
            x = ins[0].reshape(ins[0].shape[0], -1)
            out = x @ _t(p["w"]) + _t(p["b"])
        elif t == "eltwise":
            out = ins[0]
            for y in ins[1:]:
                out = out + y
        elif t == "concat":
            out = torch.cat(ins, dim=1)
        elif t == "reshape":
            from eco_tpu.ops import caffe_reshape_dims

            dims = caffe_reshape_dims(
                tuple(ins[0].shape), l.opt("dims"),
                axis=int(l.opt("axis", 0)), num_axes=int(l.opt("num_axes", -1)),
            )
            out = ins[0].reshape(dims)
        elif t in ("identity", "split"):
            out = ins[0]
        elif t == "dropout":
            out = ins[0]  # eval
        elif t == "softmax":
            out = torch.softmax(ins[0], dim=-1)
        elif t == "scale":
            shape = (1, -1) + (1,) * (ins[0].dim() - 2)
            out = ins[0] * _t(p["scale"]).reshape(shape) + _t(
                p.get("shift", np.zeros(1))
            ).reshape(shape if "shift" in p else (1,))
        else:
            raise NotImplementedError(t)
        for top in l.tops:
            blobs[top] = out
    return blobs


def _randomize_bn(params, state, seed=0):
    rng = np.random.default_rng(seed)
    for lname, lp in params.items():
        if "gamma" in lp:
            c = lp["gamma"].shape[0]
            lp["gamma"] = jnp.asarray(1 + 0.2 * rng.standard_normal(c), jnp.float32)
            lp["beta"] = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
            state[lname]["mean"] = jnp.asarray(0.3 * rng.standard_normal(c), jnp.float32)
            state[lname]["var"] = jnp.asarray(0.5 + rng.random(c), jnp.float32)
    return params, state


@pytest.mark.parametrize("builder,kw", [
    (build_eco_lite, dict(num_classes=12, num_segments=4, crop_size=64,
                          fc_name="fc8")),
    (build_eco_full, dict(num_classes=7, num_segments=4, crop_size=224,
                          fc_name="fc8N")),
])
def test_eco_matches_torch_engine(builder, kw):
    g = builder(batch=2, **kw)
    prog = Program(g, train=False)
    rng = np.random.default_rng(0)
    crop = kw["crop_size"]
    data = rng.standard_normal((2, 4, crop, crop, 3)).astype(np.float32)
    params, state = prog.init(jax.random.PRNGKey(0), {"data": jnp.asarray(data)})
    params, state = _randomize_bn(params, state)

    ours = prog.apply(params, state, {"data": jnp.asarray(data)})[0]
    # torch path: NCHW logical layout (N, S, C, H, W)
    ref_blobs = torch_execute(
        prog, params, state,
        {"data": torch.from_numpy(data).permute(0, 1, 4, 2, 3).contiguous()},
    )
    ref = ref_blobs["probs"].numpy()
    got = np.asarray(ours["probs"], np.float32)
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-4)
    # logits too (tighter signal than softmax)
    fc_top = [l.tops[0] for l in prog.exec_layers if l.type == "innerproduct"][-1]
    got_fc = np.asarray(prog.apply(params, state, {"data": jnp.asarray(data)},
                                   capture=[fc_top])[0][fc_top], np.float32)
    ref_fc = ref_blobs[fc_top].numpy()
    np.testing.assert_allclose(got_fc, ref_fc, rtol=5e-3, atol=5e-3)
