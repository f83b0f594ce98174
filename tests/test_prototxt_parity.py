"""Native-builder vs imported-prototxt numeric parity.

The round-1 goldens only covered the native builders; these tests close the
loop on "drop-in Caffe compatibility": identical weights loaded by layer name
into (a) the native ``build_eco_lite/full`` graphs and (b) the graphs imported
from the UNMODIFIED reference prototxts
(/root/reference/models_ECO_Lite/kinetics/deploy.prototxt:1-1713,
 /root/reference/models_ECO_Full/kinetics/deploy.prototxt, incl. the
consensus peephole at ECO_full.prototxt:4802-4810) must produce allclose
logits.  A transcription slip in models/*.py (channel width, stride, pool
type, tap point) fails these tests.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eco_tpu.models import build_eco_full, build_eco_lite
from eco_tpu.runtime import Program
from eco_tpu.spec.prototxt import graph_from_prototxt

from test_golden_torch import _randomize_bn, torch_execute

REF = "/root/reference"
pytestmark = [
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted"),
    pytest.mark.slow,  # full-model CPU compiles dominate
]


def _copy_by_name(src_params, src_state, dst_params, dst_state):
    """Name-based weight transfer; returns the copied trees.

    Asserts the param-bearing layer-name sets agree exactly -- a renamed
    layer would otherwise silently stay at random init.
    """
    assert set(dst_params) == set(src_params), (
        sorted(set(dst_params) ^ set(src_params))
    )
    new_p = {}
    for lname, lp in dst_params.items():
        assert set(lp) == set(src_params[lname]), lname
        for pname, v in lp.items():
            sv = src_params[lname][pname]
            assert tuple(sv.shape) == tuple(v.shape), (lname, pname)
        new_p[lname] = dict(src_params[lname])
    new_s = {}
    for lname, ls in dst_state.items():
        assert lname in src_state, lname
        new_s[lname] = dict(src_state[lname])
    return new_p, new_s


@pytest.mark.parametrize(
    "deploy,builder,kw,fc",
    [
        (
            "models_ECO_Lite/kinetics/deploy.prototxt",
            build_eco_lite,
            dict(num_classes=400, num_segments=16, fc_name="fc8"),
            "fc8",
        ),
        (
            "models_ECO_Full/kinetics/deploy.prototxt",
            build_eco_full,
            dict(num_classes=400, num_segments=16, fc_name="fc8N"),
            "fc8N",
        ),
    ],
    ids=["eco_lite", "eco_full"],
)
def test_native_builder_matches_imported_deploy(deploy, builder, kw, fc):
    S = kw["num_segments"]
    native = builder(batch=1, crop_size=224, **kw)
    nprog = Program(native, train=False)
    imported = graph_from_prototxt(open(f"{REF}/{deploy}").read())
    iprog = Program(imported, train=False)

    rng = np.random.default_rng(0)
    data = rng.standard_normal((1, S, 224, 224, 3)).astype(np.float32)
    nparams, nstate = nprog.init(
        jax.random.PRNGKey(0), {"data": jnp.asarray(data)}
    )
    nparams, nstate = _randomize_bn(nparams, nstate)
    iparams, istate = iprog.init(
        jax.random.PRNGKey(1), {"data": jnp.asarray(data[0])}
    )
    iparams, istate = _copy_by_name(nparams, nstate, iparams, istate)

    n_out = nprog.apply(nparams, nstate, {"data": jnp.asarray(data)},
                        capture=[fc])[0][fc]
    # deploy graphs take the pre-folded (N*S, H, W, C) layout; the classifier
    # layer (fc8N in ECO-Full) writes its top blob under the name "fc8"
    i_out = iprog.apply(iparams, istate, {"data": jnp.asarray(data[0])})[0]["fc8"]
    np.testing.assert_allclose(
        np.asarray(n_out, np.float32), np.asarray(i_out, np.float32),
        rtol=2e-3, atol=2e-4,
    )


def test_imported_eco_full_deploy_matches_torch_engine():
    """Torch golden engine over the *imported* ECO-Full deploy graph --
    independent of both the native builders and the XLA executor."""
    import torch

    imported = graph_from_prototxt(
        open(f"{REF}/models_ECO_Full/kinetics/deploy.prototxt").read()
    )
    prog = Program(imported, train=False)
    rng = np.random.default_rng(0)
    data = rng.standard_normal((16, 224, 224, 3)).astype(np.float32)
    params, state = prog.init(jax.random.PRNGKey(0), {"data": jnp.asarray(data)})
    params, state = _randomize_bn(params, state)

    ours = prog.apply(params, state, {"data": jnp.asarray(data)})[0]
    ref_blobs = torch_execute(
        prog, params, state,
        {"data": torch.from_numpy(data).permute(0, 3, 1, 2).contiguous()},
    )
    got = np.asarray(ours["fc8"], np.float32)
    ref = ref_blobs["fc8"].numpy()
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)
