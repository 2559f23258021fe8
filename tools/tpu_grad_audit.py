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

def ce(skip, p, targets):
    logits = wn.head_logits(p, cfg, skip)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.mean(-jnp.take_along_axis(logp, targets[..., None], -1)[..., 0])

def loss_oracle(p, tokens):
    inputs, targets = tokens[:, :-1], tokens[:, 1:]
    prev = jnp.pad(inputs[:, :-1], ((0,0),(1,0)))
    x = wn.embed_tokens(p, cfg, inputs, prev)
    return ce(oracle_skip(p, x), p, targets)

def loss_fused(p, tokens):
    inputs, targets = tokens[:, :-1], tokens[:, 1:]
    prev = jnp.pad(inputs[:, :-1], ((0,0),(1,0)))
    x = wn.embed_tokens(p, cfg, inputs, prev)
    return ce(ts.forward_skip_fused(p, cfg, x), p, targets)

p = wn.init_params(cfg, jax.random.PRNGKey(0))
_ = float(jnp.sum(p['b']))
toks = jax.random.randint(jax.random.PRNGKey(1), (8, 8193), 0, 256)
lo, go = jax.jit(jax.value_and_grad(loss_oracle))(p, toks)
lf, gf = jax.jit(jax.value_and_grad(loss_fused))(p, toks)
log('loss oracle/fused:', float(lo), float(lf))
for (ka, a), (kb, b) in zip(jax.tree_util.tree_flatten_with_path(go)[0],
                            jax.tree_util.tree_flatten_with_path(gf)[0]):
    a = np.asarray(a, np.float32); b = np.asarray(b, np.float32)
    scale = np.abs(a).max() + 1e-9
    log(f'{jax.tree_util.keystr(ka):16s} maxrel {np.abs(b-a).max()/scale:9.5f}  cos {np.dot(a.ravel(),b.ravel())/(np.linalg.norm(a)*np.linalg.norm(b)+1e-12):.6f}')
