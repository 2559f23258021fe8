import jax, jax.numpy as jnp, numpy as np
from wavenet_tpu.config import WaveNetConfig
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.ops.pallas import train_stack as ts
def log(*a): print(*a, flush=True)

cfg = WaveNetConfig(num_blocks=2, max_dilation=8, residual_channels=16,
                    skip_channels=16, compute_dtype='bfloat16')
p = wn.init_params(cfg, jax.random.PRNGKey(0))
_ = float(jnp.sum(p['b']))
toks = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, 256)
prev = jnp.pad(toks[:, :-1], ((0,0),(1,0)))
x = wn.embed_tokens(p, cfg, toks, prev)

# kernel compiled vs kernel interpret — SAME semantics expected
skip_hw = ts.forward_skip_fused(p, cfg, x, interpret=False, tile=8)
skip_it = ts.forward_skip_fused(p, cfg, x, interpret=True, tile=8)
log('kernel hw vs interpret max diff:', float(jnp.abs(skip_hw - skip_it).max()))
# also single-tile
skip_hw1 = ts.forward_skip_fused(p, cfg, x, interpret=False, tile=64)
skip_it1 = ts.forward_skip_fused(p, cfg, x, interpret=True, tile=64)
log('single-tile hw vs interpret:', float(jnp.abs(skip_hw1 - skip_it1).max()))
log('hw multi vs single tile:', float(jnp.abs(skip_hw - skip_hw1).max()))
