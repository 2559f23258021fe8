import jax, jax.numpy as jnp, numpy as np
from wavenet_tpu.config import small
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.ops.pallas import train_stack as ts
def log(*a): print(*a, flush=True)
cfg = small()
p = wn.init_params(cfg, jax.random.PRNGKey(0))
_ = float(jnp.sum(p['b']))
for T in [512, 1024, 2048]:
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, T), 0, 256)
    prev = jnp.pad(toks[:, :-1], ((0,0),(1,0)))
    x = wn.embed_tokens(p, cfg, toks, prev)
    hw = ts.forward_skip_fused(p, cfg, x)
    it = ts.forward_skip_fused(p, cfg, x, interpret=True)
    d = np.asarray(jnp.abs(hw-it).max(axis=2))[0]
    nz = np.nonzero(d > 1e-6)[0]
    log(f'T={T}: max {d.max():.4f} first-bad {int(nz[0]) if len(nz) else None}')
