"""Inference graph optimizations: sibling-1x1 merge + combined pipeline."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from eco_tpu.convert import optimize_for_inference
from eco_tpu.models import build_eco_lite
from eco_tpu.runtime import Program
from eco_tpu.spec.transforms import merge_sibling_1x1_convs


def _setup():
    g = build_eco_lite(num_classes=10, num_segments=4, crop_size=64, batch=1)
    prog = Program(g, train=False)
    data = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 4, 64, 64, 3)), jnp.float32
    )
    params, state = prog.init(jax.random.PRNGKey(0), {"data": data})
    rng = np.random.default_rng(1)
    for ln, lp in params.items():
        if "gamma" in lp:
            c = lp["gamma"].shape[0]
            lp["gamma"] = jnp.asarray(1 + 0.2 * rng.standard_normal(c), jnp.float32)
            state[ln]["mean"] = jnp.asarray(0.2 * rng.standard_normal(c), jnp.float32)
            state[ln]["var"] = jnp.asarray(0.5 + rng.random(c), jnp.float32)
    return g, prog, params, state, data


def test_merge_sibling_1x1_convs_exact():
    g, prog, params, state, data = _setup()
    ref = prog.apply(params, state, {"data": data})[0]["probs"]
    g2, p2, s2 = merge_sibling_1x1_convs(g, params, state)
    merged = [l.name for l in g2.layers if l.name.endswith("__merged")]
    # inception 3a and 3b both have three sibling 1x1 towers
    assert "inception_3a_1x1__merged" in merged
    assert "inception_3b_1x1__merged" in merged
    # merged conv width = 64 + 64 + 64
    assert p2["inception_3a_1x1__merged"]["w"].shape == (1, 1, 192, 192)
    out = Program(g2, train=False).apply(p2, s2, {"data": data})[0]["probs"]
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_optimize_for_inference_pipeline():
    g, prog, params, state, data = _setup()
    ref = prog.apply(params, state, {"data": data})[0]["probs"]
    g2, p2, s2 = optimize_for_inference(g, params, state)
    # merge + fold composed: no plain BN layers remain on conv outputs
    types = [l.type for l in g2.layers]
    assert "bn" not in types
    out = Program(g2, train=False).apply(p2, s2, {"data": data})[0]["probs"]
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=5e-4, atol=5e-5)
