import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, time
from wavenet_tpu.config import fastgen_bench
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.ops.pallas import decode as pdec
def log(*a): print(*a, flush=True)
cfg = fastgen_bench()
p = wn.init_params(cfg, jax.random.PRNGKey(0))
_ = float(jnp.sum(p['b']))
for B in (32, 24):
    if not pdec.fits_vmem(cfg, B): continue
    N = 4096
    np.asarray(pdec.generate_pallas(p, cfg, jax.random.PRNGKey(1), N,
                                    batch=B))            # compile
    t0 = time.perf_counter()
    # readback-timed, fresh key (early-return + relay-cache traps,
    # BASELINE.md round 4)
    np.asarray(pdec.generate_pallas(p, cfg, jax.random.PRNGKey(2), N,
                                    batch=B))
    dt = time.perf_counter()-t0
    log(f'pallas B={B}: {N/dt:.0f} steps/s {N*B/dt:.0f} samples/s rtf={N/dt/cfg.sample_rate:.2f}')
