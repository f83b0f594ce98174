"""Train-mode BN residual study v2 (VERDICT r5 #4).

v1 flaw: funneling outputs into the timing scalar let XLA elide the HBM
write of y entirely; every variant measured reads only.  v2 wraps outputs
in lax.optimization_barrier so y must materialize -- copy is a true 1R+1W,
bn_train a true 2R+1W.  iters=128, min of 3 repeats.
"""
import os
import sys
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from jax import lax

from eco_tpu.ops.norm import bn_train
from eco_tpu.runtime.profiler import _device_loop_ms

SHAPES = [
    ("conv1_out", (256, 112, 112, 64)),
    ("conv2_out", (256, 56, 56, 192)),
    ("inc3b_out", (256, 28, 28, 320)),
    ("res3_out", (16, 16, 28, 28, 128)),
    ("res5_out", (16, 4, 7, 7, 512)),
]

HBM_GBS = 819.0


def loop_ms(fn, args, iters=128, repeats=3):
    return min(_device_loop_ms(fn, args, iters) for _ in range(repeats))


tot = {"bn": 0.0, "floor": 0.0}
for name, shape in SHAPES:
    c = shape[-1]
    x = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16))
    gamma = jnp.ones((c,), jnp.float32)
    beta = jnp.zeros((c,), jnp.float32)
    rm = jnp.zeros((c,), jnp.float32)
    rv = jnp.ones((c,), jnp.float32)

    def f_copy(x):
        return lax.optimization_barrier(
            (x.astype(jnp.float32) * 1.0000001).astype(jnp.bfloat16))

    def f_moments(x):
        xf = x.astype(jnp.float32)
        ax = tuple(range(x.ndim - 1))
        return lax.optimization_barrier(
            (jnp.mean(xf, ax), jnp.mean(jnp.square(xf), ax)))

    def f_bn(x, gamma, beta, rm, rv):
        return lax.optimization_barrier(bn_train(x, gamma, beta, rm, rv))

    def f_bn_relu(x, gamma, beta, rm, rv):
        y, m, v = bn_train(x, gamma, beta, rm, rv)
        return lax.optimization_barrier((jax.nn.relu(y), m, v))

    ms_copy = loop_ms(f_copy, (x,))
    ms_mom = loop_ms(f_moments, (x,))
    ms_bn = loop_ms(f_bn, (x, gamma, beta, rm, rv))
    ms_bnr = loop_ms(f_bn_relu, (x, gamma, beta, rm, rv))
    gb = x.size * 2 / 1e9
    an_floor = (3 * gb) / HBM_GBS * 1e3  # 2R + 1W analytic
    floor = ms_copy + ms_mom             # measured 1R1W + 1R
    tot["bn"] += ms_bn
    tot["floor"] += floor
    print(f"{name:10s} {str(shape):22s} {gb*1e3:7.1f} MB | "
          f"copy(1R1W) {ms_copy:6.3f}  moments(1R) {ms_mom:6.3f}  "
          f"bn {ms_bn:6.3f}  bn+relu {ms_bnr:6.3f}  "
          f"floor-meas {floor:6.3f}  floor-819GB/s {an_floor:6.3f}  "
          f"bn/floor {ms_bn/max(floor,1e-9):4.2f}",
          flush=True)
print(f"TOTAL bn {tot['bn']:.3f} ms vs measured floor {tot['floor']:.3f} ms "
      f"-> headroom {(tot['bn']-tot['floor']):.3f} ms over these shapes")
