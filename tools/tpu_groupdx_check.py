"""Per-group dx bit-exactness: run each layer-group's VJP on hw and in
interpret mode with identical random inputs; compare every output bitwise.
Finds WHICH group/output diverges (embed-grad divergence bisect)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                                      # noqa: E402
import jax.numpy as jnp                                         # noqa: E402
import numpy as np                                              # noqa: E402

from wavenet_tpu.config import small                            # noqa: E402
from wavenet_tpu.models import wavenet as wn                    # noqa: E402
from wavenet_tpu.ops.pallas import train_stack as ts            # noqa: E402

cfg = small()
p = wn.init_params(cfg, jax.random.PRNGKey(0))
B, T = 2, 1024
R, S = cfg.residual_channels, cfg.skip_channels
TT = ts.pick_tile(cfg, T)
groups = ts.group_plan(cfg, TT)
print(f"TT={TT} groups={groups}", flush=True)

key = jax.random.PRNGKey(7)


def cmp(tag, a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    eq = np.array_equal(a, b)
    rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-12)
    print(f"  {tag}: {'BIT-EXACT' if eq else f'DIFF rel {rel:.3e}'}",
          flush=True)
    return eq


for gi, (lo, hi) in enumerate(groups):
    dils = tuple(cfg.dilations[lo:hi])
    gw = ts._slice_group(p, lo, hi, False)
    ks = jax.random.split(jax.random.fold_in(key, gi), 4)
    x = (jax.random.normal(ks[0], (B, T, R), jnp.float32)
         .astype(jnp.bfloat16).astype(jnp.float32))
    skip = jax.random.normal(ks[1], (B, T, S), jnp.float32)
    dskip = jax.random.normal(ks[2], (B, T, S), jnp.float32)
    dxout = jax.random.normal(ks[3], (B, T, R), jnp.float32)

    def run(interp):
        f = lambda x, skip, gw: ts.group_apply(cfg, interp, TT, dils, (1, 1),
                                               x, skip, gw, None)
        out, vjp = jax.vjp(f, x, skip, gw)
        return out, vjp((dskip, dxout))

    (out_hw, (dx_hw, dskip_hw, dgw_hw)) = jax.jit(lambda: run(False))()
    (out_it, (dx_it, dskip_it, dgw_it)) = jax.jit(lambda: run(True))()
    print(f"group {gi} dils={dils}:", flush=True)
    cmp("fwd skip", out_hw[0], out_it[0])
    cmp("fwd x_out", out_hw[1], out_it[1])
    cmp("dx", dx_hw, dx_it)
    for k in dgw_hw:
        cmp(f"d{k}", dgw_hw[k], dgw_it[k])
