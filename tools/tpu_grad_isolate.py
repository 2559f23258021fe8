import jax, jax.numpy as jnp, numpy as np
from wavenet_tpu.config import small
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.ops.pallas import train_stack as ts
def log(*a): print(*a, flush=True)

cfg = small()
R = cfg.residual_channels
bf = jnp.bfloat16

def oracle_skip(params, x):
    x = x.astype(jnp.float32)
    skip = jnp.zeros(x.shape[:-1] + (cfg.skip_channels,), jnp.float32)
    for l in range(cfg.num_layers):
        d = cfg.dilations[l]
        xb = x.astype(bf)
        xp = jnp.pad(xb, ((0,0),(d,0),(0,0)))[:, :x.shape[1]]
        z = (jnp.dot(xb, params["w_cur"][l].reshape(R,2*R).astype(bf), preferred_element_type=jnp.float32)
             + jnp.dot(xp, params["w_prev"][l].reshape(R,2*R).astype(bf), preferred_element_type=jnp.float32)
             + params["b"][l].reshape(2*R).astype(jnp.float32))
        h = (jnp.tanh(z[..., :R]) * jax.nn.sigmoid(z[..., R:])).astype(bf)
        skip = skip + jnp.dot(h, params["w_skip"][l].astype(bf), preferred_element_type=jnp.float32) + params["b_skip"][l].astype(jnp.float32)
        x = x + jnp.dot(h, params["w_res"][l].astype(bf), preferred_element_type=jnp.float32) + params["b_res"][l].astype(jnp.float32)
    return skip

p = wn.init_params(cfg, jax.random.PRNGKey(0))
_ = float(jnp.sum(p['b']))

def audit(B, T, tag):
    toks = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, 256)
    prev = jnp.pad(toks[:, :-1], ((0,0),(1,0)))
    x = wn.embed_tokens(p, cfg, toks, prev)
    tgt = jax.random.normal(jax.random.PRNGKey(2), (B, T, cfg.skip_channels))
    lo, go = jax.jit(jax.value_and_grad(lambda p: jnp.mean((oracle_skip(p, x) - tgt)**2)))(p)
    lf, gf = jax.jit(jax.value_and_grad(lambda p: jnp.mean((ts.forward_skip_fused(p, cfg, x) - tgt)**2)))(p)
    worst = 1.0; worst_k = ''
    for (ka, a), (kb, b) in zip(jax.tree_util.tree_flatten_with_path(go)[0],
                                jax.tree_util.tree_flatten_with_path(gf)[0]):
        a = np.asarray(a, np.float32).ravel(); b = np.asarray(b, np.float32).ravel()
        n = np.linalg.norm(a)*np.linalg.norm(b)
        if n < 1e-12: continue
        cos = float(np.dot(a, b)/n)
        if cos < worst: worst, worst_k = cos, jax.tree_util.keystr(ka)
    log(f'{tag}: loss o/f {float(lo):.5f}/{float(lf):.5f} worst-cos {worst:.5f} ({worst_k})')

audit(1, 512, 'B=1 nT=1')
audit(8, 512, 'B=8 nT=1')
audit(1, 4096, 'B=1 nT=8')
audit(8, 4096, 'B=8 nT=8')
