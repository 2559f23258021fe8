import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from wavenet_tpu.config import WaveNetConfig
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.ops.pallas import decode as pdec

cfg = WaveNetConfig(num_blocks=2, max_dilation=64, residual_channels=32,
                    skip_channels=32, compute_dtype="bfloat16")
p = wn.init_params(cfg, jax.random.PRNGKey(0))
B = 8
_, sum_d = pdec._ring_offsets(cfg)

for N in (1, 2, 8, 64, 256):
    rings = jnp.zeros((sum_d, cfg.residual_channels, B), jnp.bfloat16)
    init = jnp.concatenate([jnp.full((B,1),128,jnp.int32), jnp.zeros((B,1),jnp.int32)],1)
    t_hw, r_hw, c_hw = pdec.decode_chunk(p, cfg, rings, init, jnp.int32(0), jnp.int32(0), N, temperature=0.0)
    t_it, r_it, c_it = pdec.decode_chunk(p, cfg, rings, init, jnp.int32(0), jnp.int32(0), N, temperature=0.0, interpret=True)
    tok_eq = np.array_equal(np.asarray(t_hw), np.asarray(t_it))
    ring_d = float(jnp.abs(r_hw.astype(jnp.float32) - r_it.astype(jnp.float32)).max())
    carry_eq = np.array_equal(np.asarray(c_hw), np.asarray(c_it))
    nbad = int((np.asarray(t_hw) != np.asarray(t_it)).sum())
    # first bad step
    bad = np.argwhere(np.asarray(t_hw) != np.asarray(t_it))
    first = bad[bad[:,1].argmin()].tolist() if len(bad) else None
    print(f"N={N}: tokens_eq={tok_eq} nbad={nbad} first_bad(b,t)={first} ring_maxdiff={ring_d:.4f} carry_eq={carry_eq}", flush=True)
