import jax, jax.numpy as jnp, numpy as np
from wavenet_tpu.config import small
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.ops.pallas import train_stack as ts
cfg = small()
p = wn.init_params(cfg, jax.random.PRNGKey(0))
toks = jax.random.randint(jax.random.PRNGKey(1), (1, 512), 0, 256)
prev = jnp.pad(toks[:, :-1], ((0,0),(1,0)))
x = wn.embed_tokens(p, cfg, toks, prev)
tgt = jax.random.normal(jax.random.PRNGKey(2), (1, 512, cfg.skip_channels))
l, g = jax.jit(jax.value_and_grad(lambda p: jnp.mean((ts.forward_skip_fused(p, cfg, x) - tgt)**2)))(p)
jax.block_until_ready(g)
print('bwd compiled ok, loss', float(l), flush=True)
