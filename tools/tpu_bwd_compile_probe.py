"""Does the small-preset bwd kernel compile at a given tile?  A/B helper for
VMEM-stack OOM bisects: `python tools/tpu_bwd_compile_probe.py [tile]`."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                                      # noqa: E402
import jax.numpy as jnp                                         # noqa: E402

from wavenet_tpu.config import small                            # noqa: E402
from wavenet_tpu.models import wavenet as wn                    # noqa: E402
from wavenet_tpu.ops.pallas import train_stack as ts            # noqa: E402

tile = int(sys.argv[1]) if len(sys.argv) > 1 else 512
cfg = small()
p = wn.init_params(cfg, jax.random.PRNGKey(0))
B, W = 8, 8192
toks = jax.random.randint(jax.random.PRNGKey(1), (B, W), 0, 256)
prev = jnp.pad(toks[:, :-1], ((0, 0), (1, 0)))
x = wn.embed_tokens(p, cfg, toks, prev)

g = jax.jit(lambda x: jax.grad(
    lambda xx: jnp.sum(ts.forward_skip_fused(p, cfg, xx, tile=tile)))(x))
try:
    jax.block_until_ready(g(x))
    print(f"tile={tile}: bwd COMPILES + RUNS", flush=True)
except Exception as e:
    print(f"tile={tile}: FAIL {str(e)[:300]}", flush=True)
    sys.exit(1)
