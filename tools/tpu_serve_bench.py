"""Serving-engine benchmark: concurrent request latency through the
microbatcher (WaveNetServer) on the attached chip.

Simulates an open-loop load: `--clients` threads each submit `--requests`
utterances of `--seconds` audio (Poisson-ish stagger), all sharing one
engine.  Reports, per configuration:

  * request latency p50 / p95 / max (submit -> last chunk), warm;
  * time-to-first-chunk p50 (submit -> first audio out);
  * aggregate audio-seconds/s and realtime factor across the fleet;
  * microbatching efficiency: batches launched vs requests served.

Run: python -u tools/tpu_serve_bench.py [--clients 8] [--seconds 2.0]
"""

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np                                           # noqa: E402


def pct(xs, q):
    return float(np.percentile(np.asarray(xs), q))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=3,
                    help="requests per client (first round is warmup)")
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--chunk-seconds", type=float, default=0.25)
    ap.add_argument("--stagger-ms", type=float, default=20.0)
    args = ap.parse_args()

    import jax
    from wavenet_tpu.config import fastgen_bench
    from wavenet_tpu.models import wavenet as wn
    from wavenet_tpu.models.api import WaveNet
    from wavenet_tpu.serving import WaveNetServer

    cfg = fastgen_bench()
    model = WaveNet(cfg, wn.init_params(cfg, jax.random.PRNGKey(0)))
    _ = float(np.asarray(model.params["b"]).sum())   # warm first readback
    print(f"backend={jax.default_backend()} preset=fastgen_bench "
          f"sr={cfg.sample_rate} clients={args.clients} "
          f"seconds={args.seconds}", flush=True)

    engine = WaveNetServer(model, max_batch=args.max_batch,
                           max_wait_ms=25.0,
                           chunk_seconds=args.chunk_seconds,
                           length_quantum_seconds=args.seconds)

    lat, ttfc = [], []            # measured rounds only
    lock = threading.Lock()
    barrier = threading.Barrier(args.clients)

    def client(idx: int):
        rng = np.random.default_rng(idx)
        for r in range(args.requests):
            barrier.wait()        # rounds start together (steady load)
            time.sleep(rng.uniform(0, args.stagger_ms) / 1e3)
            t0 = time.perf_counter()
            h = engine.submit(seconds=args.seconds, seed=idx * 131 + r)
            t_first = None
            for _ in h:
                if t_first is None:
                    t_first = time.perf_counter() - t0
            total = time.perf_counter() - t0
            if r > 0:             # round 0 is compile warmup
                with lock:
                    lat.append(total)
                    ttfc.append(t_first)

    t_start = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    engine.close()

    n_measured = len(lat)
    audio_s = n_measured * args.seconds
    # approximate measured-wall as total minus the warmup round's share
    measured_wall = wall * (args.requests - 1) / args.requests
    print(f"\nmeasured requests: {n_measured} "
          f"(+{args.clients} warmup)")
    print(f"latency      p50 {pct(lat, 50)*1e3:8.1f} ms   "
          f"p95 {pct(lat, 95)*1e3:8.1f} ms   "
          f"max {max(lat)*1e3:8.1f} ms")
    print(f"first chunk  p50 {pct(ttfc, 50)*1e3:8.1f} ms   "
          f"p95 {pct(ttfc, 95)*1e3:8.1f} ms")
    print(f"throughput   {audio_s / measured_wall:8.2f} audio-s/s "
          f"aggregate ({audio_s / measured_wall / args.clients:.2f}x "
          f"realtime per client)")
    s = engine.stats
    print(f"batching     {s['batches']} batches for {s['requests']} "
          f"requests ({s['requests'] / max(1, s['batches']):.2f} "
          f"req/batch; {s['padded_rows']} padded rows)")


if __name__ == "__main__":
    main()
