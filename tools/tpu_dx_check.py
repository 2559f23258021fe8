"""Bisect the embed-grad hw-vs-interpret divergence: is the fused stack's
input cotangent dx itself bit-exact between hardware and interpret?"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                                      # noqa: E402
import jax.numpy as jnp                                         # noqa: E402
import numpy as np                                              # noqa: E402

from wavenet_tpu.config import small                            # noqa: E402
from wavenet_tpu.models import wavenet as wn                    # noqa: E402
from wavenet_tpu.ops.pallas import train_stack as ts            # noqa: E402

cfg = small()
p = wn.init_params(cfg, jax.random.PRNGKey(0))
toks = jax.random.randint(jax.random.PRNGKey(2), (2, 1025), 0, 256)
inputs = toks[:, :-1]                       # as loss_fn builds it: T=1024
prev = jnp.pad(inputs[:, :-1], ((0, 0), (1, 0)))
x = wn.embed_tokens(p, cfg, inputs, prev)
print("x dtype:", x.dtype, flush=True)


def f(x, interp):
    return jnp.sum(ts.forward_skip_fused(p, cfg, x, interpret=interp))


dx_hw = jax.jit(jax.grad(lambda x: f(x, False)))(x)
dx_it = jax.jit(jax.grad(lambda x: f(x, True)))(x)
a, b = np.asarray(dx_hw, np.float64), np.asarray(dx_it, np.float64)
print("dx dtype:", dx_hw.dtype, flush=True)
eq = np.array_equal(a, b)
rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-12)
print(f"dx bit-exact: {eq}  max rel diff {rel:.3e}", flush=True)
