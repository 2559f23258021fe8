"""Train with the pure-jnp oracle of the fused kernel's recipe (autodiff)."""
import jax, jax.numpy as jnp, numpy as np
from wavenet_tpu.config import small
from wavenet_tpu.audio.dataset import AudioDataset, IteratorState
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.training.trainer import make_optimizer, TrainState
import optax, time
def log(*a): print(*a, flush=True)

cfg = small()
R = cfg.residual_channels
bf = jnp.bfloat16

def oracle_skip(params, x):
    L = cfg.num_layers
    x = x.astype(jnp.float32)
    skip = jnp.zeros(x.shape[:-1] + (cfg.skip_channels,), jnp.float32)
    for l in range(L):
        d = cfg.dilations[l]
        xb = x.astype(bf)
        xp = jnp.pad(xb, ((0,0),(d,0),(0,0)))[:, :x.shape[1]]
        wcur = params["w_cur"][l].reshape(R, 2*R).astype(bf)
        wprev = params["w_prev"][l].reshape(R, 2*R).astype(bf)
        z = (jnp.dot(xb, wcur, preferred_element_type=jnp.float32)
             + jnp.dot(xp, wprev, preferred_element_type=jnp.float32)
             + params["b"][l].reshape(2*R).astype(jnp.float32))
        h = (jnp.tanh(z[..., :R]) * jax.nn.sigmoid(z[..., R:])).astype(bf)
        skip = (skip + jnp.dot(h, params["w_skip"][l].astype(bf),
                               preferred_element_type=jnp.float32)
                + params["b_skip"][l].astype(jnp.float32))
        x = x + (jnp.dot(h, params["w_res"][l].astype(bf),
                         preferred_element_type=jnp.float32)
                 + params["b_res"][l].astype(jnp.float32))
    return skip

def loss_fn(p, tokens):
    inputs, targets = tokens[:, :-1], tokens[:, 1:]
    prev = jnp.pad(inputs[:, :-1], ((0,0),(1,0)))
    x = wn.embed_tokens(p, cfg, inputs, prev)
    skip = oracle_skip(p, x)
    logits = wn.head_logits(p, cfg, skip)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], -1)[..., 0]
    return jnp.mean(nll), jnp.mean((jnp.argmax(logits,-1)==targets).astype(jnp.float32))

tx = make_optimizer(cfg)
p = wn.init_params(cfg, jax.random.PRNGKey(cfg.seed))
state = TrainState(p, tx.init(p), jnp.zeros((), jnp.int32))

@jax.jit
def step(state, batch):
    (loss, acc), g = jax.value_and_grad(loss_fn, has_aux=True)(state.params, batch)
    updates, opt = tx.update(g, state.opt_state, state.params)
    return TrainState(optax.apply_updates(state.params, updates), opt, state.step+1), loss, acc

ds = AudioDataset.synthetic(cfg, num_clips=4, clip_seconds=2.0)
it = IteratorState(seed=cfg.seed, step=0)
for i in range(300):
    batch, it = ds.sample_batch(it)
    state, loss, acc = step(state, batch["tokens"])
log(f'oracle-autodiff: loss300={float(loss):.4f} acc={float(acc):.3f}')
