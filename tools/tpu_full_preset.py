import jax, jax.numpy as jnp, numpy as np, time
from wavenet_tpu.config import full, small
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.ops.pallas import train_stack as ts
def log(*a): print(*a, flush=True)

# small preset sanity: grouped-fwd refactor must still be hw==interpret
cfg_s = small()
p = wn.init_params(cfg_s, jax.random.PRNGKey(0))
_ = float(jnp.sum(p['b']))
toks = jax.random.randint(jax.random.PRNGKey(1), (1, 1024), 0, 256)
prev = jnp.pad(toks[:, :-1], ((0,0),(1,0)))
x = wn.embed_tokens(p, cfg_s, toks, prev)
hw = ts.forward_skip_fused(p, cfg_s, x)
it = ts.forward_skip_fused(p, cfg_s, x, interpret=True)
log('small hw-vs-interp max diff:', float(jnp.abs(hw-it).max()))

# full preset: grouped path on hardware
cfg = full()  # remat flag irrelevant for fused
log('full groups:', ts.group_plan(cfg, 512))
pf = wn.init_params(cfg, jax.random.PRNGKey(0))
B, W = cfg.batch_size, cfg.train_window
batches = [jax.random.randint(jax.random.PRNGKey(i), (B, W+1), 0, 256) for i in range(3)]

f_scan = jax.jit(lambda p, t: jax.grad(lambda pp: wn.loss_fn(pp, cfg, t)[0])(p))
f_fused = jax.jit(lambda p, t: jax.grad(lambda pp: wn.loss_fn(pp, cfg, t, use_fused=True)[0])(p))

def timeit(f, tag, iters=10):
    for bt in batches: jax.block_until_ready(f(pf, bt))
    t0 = time.perf_counter()
    for i in range(iters): r = f(pf, batches[i % 3])
    jax.block_until_ready(r)
    dt = (time.perf_counter()-t0)/iters
    log(f'{tag}: {dt*1e3:.2f} ms/step -> {B*W/dt/cfg.sample_rate:.0f} audio-s/s')

timeit(f_fused, 'full fused grad')
timeit(f_scan,  'full scan  grad')
