import jax, jax.numpy as jnp, numpy as np
from wavenet_tpu.config import small
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.ops.pallas import train_stack as ts
def log(*a): print(*a, flush=True)
cfg = small()
p = wn.init_params(cfg, jax.random.PRNGKey(0))
_ = float(jnp.sum(p['b']))
T = 1024
toks = jax.random.randint(jax.random.PRNGKey(1), (1, T), 0, 256)
prev = jnp.pad(toks[:, :-1], ((0,0),(1,0)))
x = wn.embed_tokens(p, cfg, toks, prev)
args = ts._prep_weights(cfg, *ts._stacked(p))
skip_hw, snaps_hw, stash_hw = ts._fwd(cfg, False, None, x, *ts._stacked(p))
skip_it, snaps_it, stash_it = ts._fwd(cfg, True, None, x, *ts._stacked(p))
for g, (sh, si) in enumerate(zip(snaps_hw, snaps_it)):
    d = np.asarray(jnp.abs(sh.astype(jnp.float32) - si.astype(jnp.float32)))
    log(f'group {g}: snaps diff tile0 {d[0,0].max():.4f} tile1 {d[0,1].max():.4f}')
    if d[0,1].max() > 0:
        rowmax = d[0,1].max(axis=1)
        bad = np.nonzero(rowmax > 1e-6)[0]
        log('  bad snap rows (padded ring layout):', bad[:20], '...' if len(bad)>20 else '')
d = np.asarray(jnp.abs(skip_hw - skip_it).max(axis=2))[0]
nz = np.nonzero(d > 1e-6)[0]
log('skip first-bad:', int(nz[0]) if len(nz) else None)
