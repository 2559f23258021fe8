import jax, jax.numpy as jnp, numpy as np
from wavenet_tpu.config import small
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.ops.pallas import train_stack as ts
def log(*a): print(*a, flush=True)

cfg = small()
p = wn.init_params(cfg, jax.random.PRNGKey(0))
_ = float(jnp.sum(p['b']))
toks = jax.random.randint(jax.random.PRNGKey(1), (1, 512), 0, 256)
prev = jnp.pad(toks[:, :-1], ((0,0),(1,0)))
x = wn.embed_tokens(p, cfg, toks, prev)
hw = ts.forward_skip_fused(p, cfg, x, interpret=False)
it = ts.forward_skip_fused(p, cfg, x, interpret=True)
d = jnp.abs(hw - it)
log('hw vs interpret: max', float(d.max()), 'mean', float(d.mean()),
    'argmax t =', int(jnp.argmax(d.max(axis=(0,2)))))
# per-position profile: where does it start diverging?
prof = np.asarray(d.max(axis=2))[0]
for t in [0, 1, 2, 63, 64, 127, 128, 255, 256, 400, 511]:
    log(f't={t}: {prof[t]:.6f}')
nz = np.nonzero(prof > 1e-6)[0]
log('first divergent t:', int(nz[0]) if len(nz) else None)
log('profile 0..40:', np.array2string(prof[:40], precision=4, max_line_width=200))
