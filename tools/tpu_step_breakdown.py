"""Break the small-preset train step into phases on hardware.

Times (best-of-3 x 20 iters each):
  1. fused stack grad only              (the kernel pair)
  2. full loss grad, gather embeds      (production path)
  3. full loss grad, one-hot embeds     (embed bwd as MXU matmul, no scatter)
  4. full loss fwd only
Run: python tools/tpu_step_breakdown.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from wavenet_tpu.config import small
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.ops.pallas import train_stack as ts


def log(*a):
    print(*a, flush=True)


cfg = small()
p = wn.init_params(cfg, jax.random.PRNGKey(0))
_ = float(jnp.sum(p["b"]))                       # warm readback
B, W = cfg.batch_size, cfg.train_window
toks = jax.random.randint(jax.random.PRNGKey(1), (B, W + 1), 0,
                          cfg.quantization_channels)
x = wn.embed_tokens(p, cfg, toks[:, :-1], jnp.pad(toks[:, :-2], ((0, 0), (1, 0))))


def timeit(f, tag, iters=20):
    r = f()
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f()
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / iters)
    log(f"{tag}: {best * 1e3:.2f} ms")
    return best


def onehot_embed_loss(p, tokens):
    """loss_fn with the embedding lookup as one-hot matmuls so the embed
    GRADIENT is a matmul instead of a scatter-add."""
    inputs, targets = tokens[:, :-1], tokens[:, 1:]
    prev = jnp.pad(inputs[:, :-1], ((0, 0), (1, 0)))
    Q = cfg.quantization_channels
    oh_c = jax.nn.one_hot(inputs, Q, dtype=jnp.bfloat16)
    oh_p = jax.nn.one_hot(prev, Q, dtype=jnp.bfloat16)
    x = (oh_c @ p["embed_cur"].astype(jnp.bfloat16)
         + oh_p @ p["embed_prev"].astype(jnp.bfloat16)).astype(jnp.bfloat16)
    skip = ts.forward_skip_fused(p, cfg, x.astype(jnp.float32))
    logits = wn.head_logits(p, cfg, skip)
    lse = jax.nn.logsumexp(logits, axis=-1)
    ll = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(lse - ll)


g_stack = jax.jit(lambda p, x: jax.grad(
    lambda pp: jnp.sum(ts.forward_skip_fused(pp, cfg, x)))(p))
timeit(lambda: g_stack(p, x), "1 stack grad only")

g_full = jax.jit(jax.grad(lambda pp: wn.loss_fn(pp, cfg, toks,
                                                use_fused=True)[0]))
timeit(lambda: g_full(p), "2 full loss grad (gather embeds)")

g_oh = jax.jit(jax.grad(onehot_embed_loss))
timeit(lambda: g_oh(p, toks), "3 full loss grad (one-hot embeds)")

f_full = jax.jit(lambda pp: wn.loss_fn(pp, cfg, toks, use_fused=True)[0])
timeit(lambda: f_full(p), "4 full loss fwd only")
