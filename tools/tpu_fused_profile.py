import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from wavenet_tpu.config import small
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.ops.pallas import train_stack as ts
def log(*a): print(*a, flush=True)

cfg = small()
p = wn.init_params(cfg, jax.random.PRNGKey(0))
_ = float(jnp.sum(p['b']))
B, W = 8, 8192
toks = jax.random.randint(jax.random.PRNGKey(1), (B, W), 0, 256)
prev = jnp.pad(toks[:, :-1], ((0,0),(1,0)))
x = wn.embed_tokens(p, cfg, toks, prev)

def timeit(f, tag, iters=30):
    r = f(); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f()
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter()-t0)/iters)
    log(f'{tag}: {best*1e3:.2f} ms')

for tile in (512, 1024, 2048):
    if ts.pick_tile(cfg, W) and W % tile == 0 and ts.plan_dils(cfg, cfg.dilations, tile):
        try:
            fwd = jax.jit(lambda x, t=tile: ts.forward_skip_fused(p, cfg, x, tile=t))
            timeit(lambda: fwd(x), f'fwd tile={tile}')
            g = jax.jit(lambda x, t=tile: jax.grad(lambda xx: jnp.sum(ts.forward_skip_fused(p, cfg, xx, tile=t)))(x))
            timeit(lambda: g(x), f'fwd+bwd(x only) tile={tile}')
        except Exception as e:                  # larger tiles can OOM VMEM stack
            log(f'tile={tile}: FAIL {str(e)[:120]}')
    else:
        log(f'tile={tile}: unsupported')

# full grad incl weights
gw = jax.jit(lambda p, x: jax.grad(lambda pp: jnp.sum(ts.forward_skip_fused(pp, cfg, x)))(p))
timeit(lambda: gw(p, x), 'full weight-grad tile=auto')
