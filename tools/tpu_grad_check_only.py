"""Run only the train-grad hw-vs-interpret check (bisect helper)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                                      # noqa: E402
import numpy as np                                              # noqa: E402

from wavenet_tpu.config import small                            # noqa: E402
from wavenet_tpu.models import wavenet as wn                    # noqa: E402

cfg = small()
p = wn.init_params(cfg, jax.random.PRNGKey(0))
toks = jax.random.randint(jax.random.PRNGKey(2), (2, 1025), 0, 256)


def loss(p, interp):
    return wn.loss_fn(p, cfg, toks, use_fused=True, interpret=interp)[0]


g_hw = jax.jit(jax.grad(lambda p: loss(p, False)))(p)
g_it = jax.jit(jax.grad(lambda p: loss(p, True)))(p)
for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_hw)[0],
        jax.tree_util.tree_flatten_with_path(g_it)[0]):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = max(np.abs(b).max(), 1e-6)
    rel = np.abs(a - b).max() / scale
    print(f"{jax.tree_util.keystr(ka)}: rel {rel:.3e} "
          f"{'OK' if rel < 1e-4 else 'FAIL'}", flush=True)
