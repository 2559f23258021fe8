import jax, jax.numpy as jnp, numpy as np, time
from wavenet_tpu.config import small
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.ops.pallas import train_stack as ts
def log(*a): print(*a, flush=True)

cfg = small()
p = wn.init_params(cfg, jax.random.PRNGKey(0))
_ = float(jnp.sum(p['b']))
B, W = 8, 8192
assert ts.supported(cfg, W)
batches = [jax.random.randint(jax.random.PRNGKey(i), (B, W+1), 0, 256) for i in range(4)]

# correctness compiled: fused vs scan on a smaller slice
toks = batches[0][:2, :1025]
ref = wn.forward_logits(p, cfg, toks[:, :-1])
got = wn.forward_logits_fused(p, cfg, toks[:, :-1])
diff = float(jnp.abs(got - ref).max())
log('compiled fwd max diff:', diff)

ref_l, ref_g = jax.jit(jax.value_and_grad(lambda p: wn.loss_fn(p, cfg, toks)[0]))(p)
fus_l, fus_g = jax.jit(jax.value_and_grad(lambda p: wn.loss_fn(p, cfg, toks, use_fused=True)[0]))(p)
log('loss scan/fused:', float(ref_l), float(fus_l))
rel = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)-b.astype(jnp.float32)))/(jnp.max(jnp.abs(a.astype(jnp.float32)))+1e-3))
          for a, b in zip(jax.tree.leaves(ref_g), jax.tree.leaves(fus_g)))
log('max rel grad diff:', rel)

def timeit(f, tag, iters=20):
    for b in batches: jax.block_until_ready(f(p, b))
    t0 = time.perf_counter()
    for i in range(iters): r = f(p, batches[i % 4])
    jax.block_until_ready(r)
    dt = (time.perf_counter()-t0)/iters
    log(f'{tag}: {dt*1e3:.2f} ms/step -> {B*W/dt/cfg.sample_rate:.0f} audio-s/s')

f_scan = jax.jit(lambda p, t: jax.grad(lambda pp: wn.loss_fn(pp, cfg, t)[0])(p))
f_fused = jax.jit(lambda p, t: jax.grad(lambda pp: wn.loss_fn(pp, cfg, t, use_fused=True)[0])(p))
timeit(f_scan, 'scan  grad')
timeit(f_fused, 'fused grad')
