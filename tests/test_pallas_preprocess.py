"""Pallas fused preprocessing vs the host transform (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eco_tpu.ops.pallas.preprocess import preprocess_on_device


def test_preprocess_on_device_matches_host():
    rng = np.random.default_rng(0)
    N, S, H, W, crop = 2, 3, 64, 80, 32
    frames = rng.integers(0, 255, (N, S, H, W, 3), dtype=np.uint8)
    h_off = jnp.asarray([4, 16], jnp.int32)
    w_off = jnp.asarray([8, 0], jnp.int32)
    mirror = jnp.asarray([False, True])
    mean = (104.0, 117.0, 123.0)
    out = preprocess_on_device(
        jnp.asarray(frames), h_off, w_off, mirror,
        crop=crop, mean=mean, out_dtype=jnp.float32, interpret=True,
    )
    assert out.shape == (N, S, crop, crop, 3)
    # host reference
    m = np.asarray(mean, np.float32)
    for v in range(N):
        ref = frames[v, :, 4 if v == 0 else 16:, 8 if v == 0 else 0:, :]
        ref = ref[:, :crop, :crop, :].astype(np.float32) - m
        if v == 1:
            ref = ref[:, :, ::-1, :]
        np.testing.assert_allclose(np.asarray(out[v]), ref, atol=1e-5)


def test_preprocess_on_device_bf16():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (1, 2, 48, 48, 3), dtype=np.uint8)
    out = preprocess_on_device(
        jnp.asarray(frames),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), bool), crop=32, interpret=True,
    )
    assert out.dtype == jnp.bfloat16
    ref = frames[:, :, :32, :32, :].astype(np.float32) - np.asarray(
        [104, 117, 123], np.float32
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), ref, atol=1.0  # bf16 rounding
    )
