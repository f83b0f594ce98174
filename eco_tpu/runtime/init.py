"""Parameter fillers with Caffe semantics (reference include/caffe/filler.hpp).

- ``constant``: fill with ``value``.
- ``uniform``: U(min, max).
- ``gaussian``: N(mean, std).
- ``xavier``: U(-sqrt(3/n), +sqrt(3/n)) with n = fan_in (Caffe default
  ``variance_norm: FAN_IN``; AVERAGE/FAN_OUT supported).
- ``msra``: N(0, sqrt(2/n)).
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp


def _fans(shape):
    """fan_in/fan_out for our physical layouts: conv (*k, Cin, Cout) or IP
    (Din, Dout) -- receptive field = all leading dims."""
    if len(shape) == 1:
        return shape[0], shape[0]
    receptive = 1
    for d in shape[:-2]:
        receptive *= d
    return shape[-2] * receptive, shape[-1] * receptive


def fill(rng: jax.Array, shape, dtype, filler: Mapping | None) -> jax.Array:
    filler = dict(filler or {"type": "constant", "value": 0.0})
    ftype = filler.get("type", "constant")
    if ftype == "constant":
        return jnp.full(shape, float(filler.get("value", 0.0)), dtype)
    if ftype == "uniform":
        lo = float(filler.get("min", 0.0))
        hi = float(filler.get("max", 1.0))
        return jax.random.uniform(rng, shape, dtype, lo, hi)
    if ftype == "gaussian":
        mean = float(filler.get("mean", 0.0))
        std = float(filler.get("std", 1.0))
        return mean + std * jax.random.normal(rng, shape, dtype)
    fan_in, fan_out = _fans(shape)
    norm = filler.get("variance_norm", "FAN_IN")
    if norm == "AVERAGE":
        n = (fan_in + fan_out) / 2.0
    elif norm == "FAN_OUT":
        n = fan_out
    else:
        n = fan_in
    if ftype == "xavier":
        scale = (3.0 / n) ** 0.5
        return jax.random.uniform(rng, shape, dtype, -scale, scale)
    if ftype == "msra":
        std = (2.0 / n) ** 0.5
        return std * jax.random.normal(rng, shape, dtype)
    raise ValueError(f"unknown filler type {ftype!r}")
