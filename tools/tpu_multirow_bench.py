"""Hardware sweep of the multi-row fused-kernel grid (nb = batch rows per
grid step).

The 2026-08-18 v5e sweep found NO nb > 1 win (pick_nb_dils docstring has
the numbers), so pick_nb now ships (1, 1) unconditionally; this tool is the
recalibration path — rerun it on a new chip generation or libtpu and, if a
variant wins, flip pick_nb back to cost-model scoring.

For each preset and each VMEM-feasible (nb_fwd, nb_bwd) candidate, times a
jitted value_and_grad of the fused loss (the step's dominant cost; the
optimizer update is nb-independent) and prints ms/step next to the model's
estimate and the auto-pick.  nb > 1 compiles need the raised scoped-VMEM
limit (train_stack.multirow_compiler_options), applied below.

    python -u tools/tpu_multirow_bench.py [preset ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                                      # noqa: E402
import jax.numpy as jnp                                         # noqa: E402

from wavenet_tpu.config import get_config                       # noqa: E402
from wavenet_tpu.models import wavenet as wn                    # noqa: E402
from wavenet_tpu.ops.pallas import train_stack as ts            # noqa: E402


def fused_loss(p, cfg, toks, nb, mel=None, speaker=None):
    inputs, targets = toks[:, :-1], toks[:, 1:]
    prev = jnp.pad(inputs[:, :-1], ((0, 0), (1, 0)))
    x = wn.embed_tokens(p, cfg, inputs, prev)
    y = None
    if cfg.mel is not None:
        from wavenet_tpu.models.conditioning import upsample_mel
        y = upsample_mel(p["upsampler"], cfg.mel, mel, inputs.shape[1])
    g = None
    if cfg.global_classes is not None:
        g = wn.global_cond_offsets(p, cfg, speaker)
    skip = ts.forward_skip_fused(p, cfg, x, y=y, g=g, nb=nb)
    logits = wn.head_logits(p, cfg, skip)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.mean(-jnp.take_along_axis(logp, targets[..., None], -1)[..., 0])


def time_step(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def sweep(name):
    cfg = get_config(name)
    B, T = cfg.batch_size, cfg.train_window
    # the dataset yields W+1 tokens per window: stack input length == W
    toks = jax.random.randint(jax.random.PRNGKey(0), (B, T + 1), 0, 256)
    kw = {}
    if cfg.mel is not None:
        frames = T // cfg.mel.hop_length + 1
        kw["mel"] = jax.random.normal(jax.random.PRNGKey(1),
                                      (B, frames, cfg.mel.num_mels))
    if cfg.global_classes is not None:
        kw["speaker"] = jnp.zeros((B,), jnp.int32)
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    TT = ts.pick_tile(cfg, T)
    if not TT or T % TT:
        print(f"== {name}: T={T} untileable (pick_tile -> {TT}); skipping",
              flush=True)
        return
    nT = T // TT
    pick = ts.pick_nb(cfg, T, B)
    print(f"== {name}: B={B} T={T} TT={TT} auto-pick nb={pick}", flush=True)
    for nb, ng in ts.nb_candidates(cfg, cfg.dilations, TT, B):
        try:
            # nb > 1 kernel stacks exceed the default 16 MiB scoped-VMEM
            # compile limit; raise it so the sweep measures, not crashes
            opts = ts.multirow_compiler_options(nb) or None
            fn = jax.jit(jax.value_and_grad(
                lambda p: fused_loss(p, cfg, toks, nb, **kw)),
                compiler_options=opts)
            ms = time_step(fn, p) * 1e3
            mark = " <== auto" if nb == pick else ""
            print(f"  nb={nb} groups={ng}: {ms:8.3f} ms/step{mark}",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — report compile failures
            print(f"  nb={nb} groups={ng}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["small", "full", "conditional"]
    for n in names:
        sweep(n)
