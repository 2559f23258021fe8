"""Pointwise hw-vs-interpret probe of the transcendentals the fused kernel
uses (f32 tanh / sigmoid, and the gate product), over a wide input sweep.
If these differ in ulps, hw-vs-interpret 'bit-exactness' of any path through
them is data-dependent — the verify gate must band such leaves, not require
equality."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                                      # noqa: E402
import jax.numpy as jnp                                         # noqa: E402
import numpy as np                                              # noqa: E402
from jax.experimental import pallas as pl                       # noqa: E402
from jax.experimental.pallas import tpu as pltpu                # noqa: E402


def kern(x_ref, t_ref, s_ref, g_ref):
    z = x_ref[:]
    t_ref[:] = jnp.tanh(z)
    s_ref[:] = jax.nn.sigmoid(z)
    g_ref[:] = jnp.tanh(z) * jax.nn.sigmoid(z)


def run(x, interpret):
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct(x.shape, jnp.float32),) * 3,
        interpret=interpret,
    )(x)


x = jnp.linspace(-30.0, 30.0, 8 * 1024, dtype=jnp.float32).reshape(64, 128)
hw = run(x, False)
it = run(x, True)
for name, a, b in zip(("tanh", "sigmoid", "gate"), hw, it):
    a64, b64 = np.asarray(a, np.float64), np.asarray(b, np.float64)
    neq = a64 != b64
    n = int(neq.sum())
    if n:
        xs = np.asarray(x)[neq]
        rel = (np.abs(a64 - b64)[neq] /
               np.maximum(np.abs(b64[neq]), 1e-30)).max()
        print(f"{name}: {n}/{x.size} values differ, max rel {rel:.3e}, "
              f"input range [{xs.min():.2f}, {xs.max():.2f}]", flush=True)
    else:
        print(f"{name}: BIT-EXACT over [-30, 30]", flush=True)
