"""Fused Pallas max-pool vs the XLA reduce_window path (interpret on CPU).

Covers the three ceil-mode 3x3/s2 pool shapes of BN-Inception (pool1,
pool2, the inception downsamples) plus the affine/relu epilogue variants
and the clipped last window (pooling_layer.cpp:84-111 semantics).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from eco_tpu.ops.pallas.poolfuse import fused_maxpool_3x3s2, supports
from eco_tpu.ops.pool import pool_nd


@pytest.mark.parametrize(
    "shape", [(3, 112, 112, 64), (2, 56, 56, 192), (4, 28, 28, 96)]
)
def test_matches_xla_pool(shape):
    rng = np.random.default_rng(0)
    # include negatives so the -inf fill (not zero) is what makes it pass
    y = jnp.asarray(rng.standard_normal(shape) - 2.0, jnp.float32)
    ref = pool_nd(y, kernel=3, stride=2, mode="max")
    got = fused_maxpool_3x3s2(y, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)


def test_relu_and_affine_epilogues():
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.standard_normal((2, 56, 56, 64)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(64) * 0.3 + 1.0, jnp.float32)
    shift = jnp.asarray(rng.standard_normal(64) * 0.2, jnp.float32)

    ref_r = pool_nd(jnp.maximum(y, 0.0), kernel=3, stride=2, mode="max")
    got_r = fused_maxpool_3x3s2(y, relu=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(ref_r), atol=0)

    ref_a = pool_nd(jnp.maximum(y * scale + shift, 0.0),
                    kernel=3, stride=2, mode="max")
    got_a = fused_maxpool_3x3s2(y, scale, shift, affine=True, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got_a), np.asarray(ref_a), rtol=1e-6, atol=1e-6)


def test_images_per_step_grouping():
    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.standard_normal((6, 28, 28, 32)), jnp.float32)
    ref = fused_maxpool_3x3s2(y, images_per_step=1, interpret=True)
    # 6 % 4 != 0 -> wrapper must fall back to a dividing group size
    got = fused_maxpool_3x3s2(y, images_per_step=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)


def test_supports_predicate():
    assert supports((1, 112, 112, 64), (3, 3), (2, 2), (0, 0), "max")
    assert not supports((1, 112, 112, 64), (3, 3), (2, 2), (0, 0), "ave")
    assert not supports((1, 112, 112, 64), (3, 3), (1, 1), (0, 0), "max")
    assert not supports((1, 111, 112, 64), (3, 3), (2, 2), (0, 0), "max")
    assert not supports((1, 4, 7, 7, 64), (3, 3), (2, 2), (0, 0), "max")
