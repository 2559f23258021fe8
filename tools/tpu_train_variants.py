"""Experiment: training-step efficiency variants on TPU (small config)."""
import jax, jax.numpy as jnp, numpy as np, time, functools
from wavenet_tpu.config import small
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.ops.shift import shift_right
def log(*a): print(*a, flush=True)

cfg = small()
p = wn.init_params(cfg, jax.random.PRNGKey(0))
_ = float(jnp.sum(p['b']))
B, W = 8, 8192
batches = [jax.random.randint(jax.random.PRNGKey(i), (B, W+1), 0, 256) for i in range(4)]

def timeit(f, tag, iters=20):
    for b in batches: jax.block_until_ready(f(p, b))
    t0 = time.perf_counter()
    for i in range(iters):
        r = f(p, batches[i % 4])
    jax.block_until_ready(r)
    dt = (time.perf_counter()-t0)/iters
    log(f'{tag}: {dt*1e3:.2f} ms/step -> {B*W/dt/cfg.sample_rate:.0f} audio-s/s')
    return dt

# (a) current
f_cur = jax.jit(lambda p, t: jax.grad(lambda p: wn.loss_fn(p, cfg, t)[0])(p))
timeit(f_cur, 'current      ')

# (b) bf16 gate variant: monkey-layer — reimplement loss with bf16 z
def loss_bf16gate(p, tokens):
    cdt = jnp.bfloat16
    inputs, targets = tokens[:, :-1], tokens[:, 1:]
    Bc, T = inputs.shape
    R = cfg.residual_channels
    prev = jnp.pad(inputs[:, :-1], ((0,0),(1,0)))
    x = (p['embed_cur'][inputs] + p['embed_prev'][prev]).astype(cdt)
    skip = jnp.zeros((Bc, T, cfg.skip_channels), jnp.float32)
    dils = jnp.asarray(cfg.dilations, jnp.int32)
    stacked = {k: p[k] for k in ('w_cur','w_prev','b','w_res','b_res','w_skip','b_skip')}
    zeros_ctx = jnp.zeros((Bc, cfg.max_dilation, R), cdt)
    dot = lambda a, w: jax.lax.dot_general(a, w, (((a.ndim-1,),(0,)),((),())), preferred_element_type=jnp.bfloat16)
    dotf = lambda a, w: jax.lax.dot_general(a, w, (((a.ndim-1,),(0,)),((),())), preferred_element_type=jnp.float32)
    def body(carry, pl_):
        x, skip = carry
        lp, d = pl_
        xp = shift_right(x, d, zeros_ctx)
        z = dot(x, lp['w_cur'].astype(cdt)) + dot(xp, lp['w_prev'].astype(cdt)) + lp['b'].astype(cdt)
        h = (jnp.tanh(z[...,0,:]) * jax.nn.sigmoid(z[...,1,:]))
        skip = skip + dotf(h, lp['w_skip'].astype(cdt)) + lp['b_skip'].astype(jnp.float32)
        x = x + dot(h, lp['w_res'].astype(cdt)) + lp['b_res'].astype(cdt)
        return (x, skip), None
    (x, skip), _ = jax.lax.scan(body, (x, skip), (stacked, dils))
    logits = wn.head_logits(p, cfg, skip)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.mean(-jnp.take_along_axis(logp, targets[...,None], -1)[...,0])
f_b = jax.jit(lambda p, t: jax.grad(lambda pp: loss_bf16gate(pp, t))(p))
timeit(f_b, 'bf16-gate    ')

# (c) concat matmul: z = [x, xp] @ Wcat, K=2R=128 (better MXU tiles)
def loss_concat(p, tokens):
    cdt = jnp.bfloat16
    inputs, targets = tokens[:, :-1], tokens[:, 1:]
    Bc, T = inputs.shape
    R = cfg.residual_channels
    prev = jnp.pad(inputs[:, :-1], ((0,0),(1,0)))
    x = (p['embed_cur'][inputs] + p['embed_prev'][prev]).astype(cdt)
    skip = jnp.zeros((Bc, T, cfg.skip_channels), jnp.float32)
    dils = jnp.asarray(cfg.dilations, jnp.int32)
    stacked = {k: p[k] for k in ('w_cur','w_prev','b','w_res','b_res','w_skip','b_skip')}
    zeros_ctx = jnp.zeros((Bc, cfg.max_dilation, R), cdt)
    dot = lambda a, w: jax.lax.dot_general(a, w, (((a.ndim-1,),(0,)),((),())), preferred_element_type=jnp.bfloat16)
    dotf = lambda a, w: jax.lax.dot_general(a, w, (((a.ndim-1,),(0,)),((),())), preferred_element_type=jnp.float32)
    def body(carry, pl_):
        x, skip = carry
        lp, d = pl_
        xp = shift_right(x, d, zeros_ctx)
        wcat = jnp.concatenate([lp['w_cur'], lp['w_prev']], axis=0).astype(cdt)  # [2R, 2, R]
        xcat = jnp.concatenate([x, xp], axis=-1)                                  # [B,T,2R]
        z = dot(xcat, wcat) + lp['b'].astype(cdt)
        h = (jnp.tanh(z[...,0,:]) * jax.nn.sigmoid(z[...,1,:]))
        skip = skip + dotf(h, lp['w_skip'].astype(cdt)) + lp['b_skip'].astype(jnp.float32)
        x = x + dot(h, lp['w_res'].astype(cdt)) + lp['b_res'].astype(cdt)
        return (x, skip), None
    (x, skip), _ = jax.lax.scan(body, (x, skip), (stacked, dils))
    logits = wn.head_logits(p, cfg, skip)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.mean(-jnp.take_along_axis(logp, targets[...,None], -1)[...,0])
f_c = jax.jit(lambda p, t: jax.grad(lambda pp: loss_concat(pp, t))(p))
timeit(f_c, 'concat-K128  ')

# (d) bf16-gate + bf16 skip accumulation
def loss_allbf16(p, tokens):
    cdt = jnp.bfloat16
    inputs, targets = tokens[:, :-1], tokens[:, 1:]
    Bc, T = inputs.shape
    R = cfg.residual_channels
    prev = jnp.pad(inputs[:, :-1], ((0,0),(1,0)))
    x = (p['embed_cur'][inputs] + p['embed_prev'][prev]).astype(cdt)
    skip = jnp.zeros((Bc, T, cfg.skip_channels), cdt)
    dils = jnp.asarray(cfg.dilations, jnp.int32)
    stacked = {k: p[k] for k in ('w_cur','w_prev','b','w_res','b_res','w_skip','b_skip')}
    zeros_ctx = jnp.zeros((Bc, cfg.max_dilation, R), cdt)
    dot = lambda a, w: jax.lax.dot_general(a, w, (((a.ndim-1,),(0,)),((),())), preferred_element_type=jnp.bfloat16)
    def body(carry, pl_):
        x, skip = carry
        lp, d = pl_
        xp = shift_right(x, d, zeros_ctx)
        z = dot(x, lp['w_cur'].astype(cdt)) + dot(xp, lp['w_prev'].astype(cdt)) + lp['b'].astype(cdt)
        h = (jnp.tanh(z[...,0,:]) * jax.nn.sigmoid(z[...,1,:]))
        skip = skip + dot(h, lp['w_skip'].astype(cdt)) + lp['b_skip'].astype(cdt)
        x = x + dot(h, lp['w_res'].astype(cdt)) + lp['b_res'].astype(cdt)
        return (x, skip), None
    (x, skip), _ = jax.lax.scan(body, (x, skip), (stacked, dils))
    logits = wn.head_logits(p, cfg, skip.astype(jnp.float32))
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.mean(-jnp.take_along_axis(logp, targets[...,None], -1)[...,0])
f_d = jax.jit(lambda p, t: jax.grad(lambda pp: loss_allbf16(pp, t))(p))
timeit(f_d, 'all-bf16     ')
