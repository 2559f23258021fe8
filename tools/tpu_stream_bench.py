"""Streaming-serving latency/throughput of the chunked decode path.

Measures, on the fastgen_bench preset (B=1 interactive and B=8 batch):
  * time-to-first-audio (compile excluded): latency of the first chunk;
  * sustained realtime factor over a 4 s stream at 0.25 s chunks.

Run: python -u tools/tpu_stream_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                                   # noqa: E402
import jax.numpy as jnp                                      # noqa: E402
import numpy as np                                           # noqa: E402

from wavenet_tpu.config import fastgen_bench                 # noqa: E402
from wavenet_tpu.generate.sampler import generate_stream     # noqa: E402
from wavenet_tpu.models import wavenet as wn                 # noqa: E402


def bench(batch: int, chunk_s: float = 0.25, total_s: float = 4.0):
    cfg = fastgen_bench()
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    _ = float(jnp.sum(p["b"]))                               # warm readback
    sr = cfg.sample_rate
    n = int(total_s * sr)
    chunk = int(chunk_s * sr)

    def run(collect_first=False):
        it = generate_stream(p, cfg, jax.random.PRNGKey(1), n,
                             chunk_samples=chunk, batch=batch)
        t0 = time.perf_counter()
        first = None
        out = 0
        for c in it:
            np.asarray(c)       # readback-timed: block_until_ready can
            # return early on the decode kernel's outputs (BASELINE.md
            # round-4 re-pin) — TTFC must include the chunk readback anyway
            if first is None:
                first = time.perf_counter() - t0
            out += c.shape[1]
        return first, time.perf_counter() - t0, out

    run()                                                    # compile
    best_first, best_total = 1e9, 1e9
    for _ in range(3):
        first, total, out = run()
        best_first = min(best_first, first)
        best_total = min(best_total, total)
    rt = total_s / best_total
    print(f"B={batch}: first {chunk_s * 1e3:.0f}ms-audio chunk in "
          f"{best_first * 1e3:.0f} ms; {total_s:.0f}s stream in "
          f"{best_total:.2f}s = {rt:.2f}x realtime/utt "
          f"({out * batch / best_total / 1e3:.0f}k samples/s)", flush=True)


if __name__ == "__main__":
    assert jax.devices()[0].platform != "cpu"
    bench(1)
    bench(8)
