"""Hardware check of the SHIPPED decode_unroll path on the full preset.

The round-4 profile measured unroll=8 at +42% on a rebuilt decode loop
(tools/tpu_full_decode_profile.py); this times the real `wn.generate`
scan route with cfg.decode_unroll — readback-timed, varied keys (the
relay caches identical jit calls) — and measures what the persistent
compilation cache does to the unrolled shape's cold compile across
process restarts.

  python tools/tpu_unroll_bench.py           # rates + in-process compiles
  python tools/tpu_unroll_bench.py compile   # subprocess: one cold compile
                                             #   (used for the cache probe)

Writes runs/evidence/full_decode/unroll.json.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "runs", "evidence", "full_decode", "unroll.json")
# probe-PRIVATE cache: the cold probe rmtree's this, and runs/.xla_cache is
# the default persistent cache of live serve.py/train.py processes on the
# same machine — wiping theirs would silently destroy a production warm
# restart (round-4 advisor)
CACHE = os.path.join(ROOT, "runs", ".xla_cache_probe")
NUM, BATCH = 4096, 8


def _gen(cfg):
    import jax
    from wavenet_tpu.models import wavenet as wn
    return jax.jit(lambda p, k: wn.generate(p, cfg, k, num_samples=NUM,
                                            batch=BATCH))


def compile_once(unroll: int) -> float:
    """Compile (and run once) the unrolled decode; return wall seconds up
    to the first result — what a fresh serving process actually waits."""
    import jax
    import numpy as np
    from wavenet_tpu.config import full
    from wavenet_tpu.models import wavenet as wn

    cfg = full().replace(decode_unroll=unroll)
    params = wn.init_params(cfg, jax.random.PRNGKey(0))
    gen = _gen(cfg)
    t0 = time.time()
    np.asarray(gen(params, jax.random.PRNGKey(1)))
    return time.time() - t0


def main():
    from wavenet_tpu.utils import compcache
    compcache.enable(CACHE)

    import jax
    import numpy as np
    from wavenet_tpu.config import full
    from wavenet_tpu.models import wavenet as wn

    rec = {"num_samples": NUM, "batch": BATCH}
    params = wn.init_params(full(), jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    for unroll in (1, 8):
        cfg = full().replace(decode_unroll=unroll)
        gen = _gen(cfg)
        t0 = time.time()
        np.asarray(gen(params, key))
        rec[f"u{unroll}_compile_s"] = round(time.time() - t0, 1)
        rates = []
        for w in range(5):
            t0 = time.time()
            np.asarray(gen(params, jax.random.fold_in(key, w + 1)))
            rates.append(NUM / (time.time() - t0))
            time.sleep(1.0)
        rates.sort()
        rec[f"u{unroll}_steps_per_sec_best"] = round(rates[-1], 1)
        rec[f"u{unroll}_steps_per_sec_median"] = round(rates[2], 1)
        print(f"unroll={unroll}: best {rates[-1]:.0f} median {rates[2]:.0f} "
              f"steps/s (compile {rec[f'u{unroll}_compile_s']}s)")

    rec["u8_vs_u1_best"] = round(
        rec["u8_steps_per_sec_best"] / rec["u1_steps_per_sec_best"], 3)
    rec["u8_vs_u1_median"] = round(
        rec["u8_steps_per_sec_median"] / rec["u1_steps_per_sec_median"], 3)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=2)
    print("wrote", OUT)
    print("now run the cache probe (the TPU lock forbids doing it from a "
          "live parent): python tools/tpu_unroll_bench.py compile "
          "[cold|warm]")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "compile":
        # fresh-process probe: "cold" wipes the on-disk cache first, "warm"
        # (default) reuses it — run them as SEPARATE sequential invocations
        # (a live parent process holds the TPU lock, so a subprocess probe
        # deadlocks; learned the hard way).  The wall time printed is what
        # a restarted serving process waits for its first audio.
        from wavenet_tpu.utils import compcache
        if len(sys.argv) > 2 and sys.argv[2] == "cold":
            import shutil
            shutil.rmtree(CACHE, ignore_errors=True)
        compcache.enable(CACHE)
        dt = compile_once(8)
        mode = sys.argv[2] if len(sys.argv) > 2 else "warm"
        print(f"fresh process ({mode} cache) time-to-first-result: {dt:.1f}s")
        if os.path.exists(OUT):
            with open(OUT) as f:
                rec = json.load(f)
            rec[f"u8_fresh_process_{mode}_s"] = round(dt, 1)
            with open(OUT, "w") as f:
                json.dump(rec, f, indent=2)
    else:
        main()
