import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, time
from wavenet_tpu.config import conditional
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.ops.pallas import train_stack as ts
def log(*a): print(*a, flush=True)

cfg = conditional()
log('supported:', ts.supported(cfg, cfg.train_window),
    'groups:', ts.group_plan(cfg, ts.pick_tile(cfg, cfg.train_window)))
p = wn.init_params(cfg, jax.random.PRNGKey(0))
_ = float(jnp.sum(p['b']))
B, W = cfg.batch_size, cfg.train_window
F = W // cfg.mel.hop_length
toks = jax.random.randint(jax.random.PRNGKey(1), (B, W+1), 0, 256)
mel = jax.random.normal(jax.random.PRNGKey(2), (B, F, cfg.mel.num_mels))

# hw-vs-interpret equality of the cond fused forward
small_toks, small_mel = toks[:1, :1025], mel[:1, :1024//cfg.mel.hop_length]
ref = wn.forward_logits_fused(p, cfg, small_toks[:, :-1], interpret=True, mel=small_mel)
hw  = wn.forward_logits_fused(p, cfg, small_toks[:, :-1], interpret=False, mel=small_mel)
log('cond fused hw-vs-interp max diff:', float(jnp.abs(hw-ref).max()))

f_scan = jax.jit(lambda p, t, m: jax.grad(lambda pp: wn.loss_fn(pp, cfg, t, mel=m)[0])(p))
f_fused = jax.jit(lambda p, t, m: jax.grad(lambda pp: wn.loss_fn(pp, cfg, t, mel=m, use_fused=True)[0])(p))
def timeit(f, tag, iters=10):
    jax.block_until_ready(f(p, toks, mel))
    t0 = time.perf_counter()
    for i in range(iters): r = f(p, toks, mel)
    jax.block_until_ready(r)
    dt = (time.perf_counter()-t0)/iters
    log(f'{tag}: {dt*1e3:.2f} ms/step -> {B*W/dt/cfg.sample_rate:.0f} audio-s/s')
timeit(f_fused, 'cond fused grad')
timeit(f_scan,  'cond scan  grad')
