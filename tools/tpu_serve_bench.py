"""Serving-engine benchmark: concurrent request latency through the
microbatcher (WaveNetServer) on the attached chip.

Simulates an open-loop load: `--clients` threads each submit `--requests`
utterances of `--seconds` audio (Poisson-ish stagger), all sharing one
engine.  Reports, per configuration:

  * request latency p50 / p95 / max (submit -> last chunk), warm;
  * time-to-first-chunk p50 / p95 (submit -> first audio out);
  * aggregate audio-seconds/s and realtime factor across the fleet;
  * microbatching efficiency: batches launched vs requests served.

Scenarios:
  * default: pure batchable load;
  * --mixed: the SAME batchable load re-run while a background client keeps
    a long mel-conditioned (singleton-lane) decode in flight the whole time
    — reports batchable p95 time-to-first-audio for both phases and their
    ratio (round-2 verdict #6 done-criterion: within +/-20%);
  * --mesh "dp,mp": serve through a jax.sharding.Mesh (distributed decode
    path — with one attached chip use "1,1", which exercises the mesh
    routing incl. the Pallas-kernel fan-out for sampled traffic).

Run: python -u tools/tpu_serve_bench.py [--clients 8] [--seconds 2.0]
     [--mixed] [--mesh 1,1]
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


def run_load(engine, clients: int, requests: int, seconds: float,
             stagger_ms: float, seed0: int = 0, mel=None):
    """Open-loop batchable load; returns (latencies, ttfc, wall_s) over the
    measured (non-warmup) rounds.  mel: optional [frames, M] features —
    every request then carries them (the round-5 batched-vocoder product
    load; same-signature mel requests group on the conditioned lane)."""
    lat, ttfc = [], []
    lock = threading.Lock()
    barrier = threading.Barrier(clients)

    def client(idx: int):
        rng = np.random.default_rng(idx)
        for r in range(requests):
            barrier.wait()        # rounds start together (steady load)
            time.sleep(rng.uniform(0, stagger_ms) / 1e3)
            t0 = time.perf_counter()
            h = engine.submit(seconds=seconds, seed=seed0 + idx * 131 + r,
                              mel=mel)
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
               for i in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return lat, ttfc, time.perf_counter() - t_start


def report(tag, lat, ttfc, wall, requests, clients, seconds):
    n_measured = len(lat)
    audio_s = n_measured * seconds
    measured_wall = wall * (requests - 1) / requests
    print(f"\n[{tag}] measured requests: {n_measured} (+{clients} warmup)")
    print(f"latency      p50 {pct(lat, 50)*1e3:8.1f} ms   "
          f"p95 {pct(lat, 95)*1e3:8.1f} ms   "
          f"max {max(lat)*1e3:8.1f} ms")
    print(f"first chunk  p50 {pct(ttfc, 50)*1e3:8.1f} ms   "
          f"p95 {pct(ttfc, 95)*1e3:8.1f} ms")
    print(f"throughput   {audio_s / measured_wall:8.2f} audio-s/s "
          f"aggregate ({audio_s / measured_wall / clients:.2f}x "
          f"realtime per client)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=3,
                    help="requests per client (first round is warmup)")
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--chunk-seconds", type=float, default=0.25)
    ap.add_argument("--stagger-ms", type=float, default=20.0)
    ap.add_argument("--mixed", action="store_true",
                    help="re-run the load with a concurrent long mel "
                         "decode on the singleton lane")
    ap.add_argument("--mel-load", action="store_true",
                    help="EVERY request carries mel features (the "
                         "batched-vocoder product load, round 5: "
                         "same-signature mel requests group on the "
                         "conditioned lane instead of serializing)")
    ap.add_argument("--mel-seconds", type=float, default=4.0,
                    help="length of each background mel request (--mixed)")
    ap.add_argument("--mesh", default=None,
                    help='serve through a mesh, e.g. "1,1" (dp,mp)')
    ap.add_argument("--preset", default="fastgen_bench",
                    help="model preset to serve (fastgen_bench, full, "
                         "full_vocoder, ...).  '--preset full --mixed' is "
                         "the flagship scenario: batchable full-preset "
                         "traffic through the wide-R kernel while a long "
                         "wide mel singleton decodes in flight")
    args = ap.parse_args()

    import jax
    from wavenet_tpu.config import get_config
    from wavenet_tpu.models import wavenet as wn
    from wavenet_tpu.models.api import WaveNet
    from wavenet_tpu.serving import WaveNetServer

    cfg = get_config(args.preset)
    if (args.mixed or args.mel_load) and cfg.mel is None:
        # the conditioned lane needs a mel-conditional model
        from wavenet_tpu.config import MelConfig
        cfg = cfg.replace(mel=MelConfig())
    mesh = None
    if args.mesh:
        from wavenet_tpu.parallel.mesh import make_mesh
        dp, mp = (int(v) for v in args.mesh.split(","))
        cfg = cfg.replace(data_parallel=dp, model_parallel=mp)
        mesh = make_mesh(cfg)
    model = WaveNet(cfg, wn.init_params(cfg, jax.random.PRNGKey(0)))
    _ = float(np.asarray(model.params["b"]).sum())   # warm first readback
    print(f"backend={jax.default_backend()} preset={args.preset} "
          f"sr={cfg.sample_rate} clients={args.clients} "
          f"seconds={args.seconds} mesh={args.mesh or '-'}", flush=True)

    engine = WaveNetServer(model, max_batch=args.max_batch,
                           max_wait_ms=25.0,
                           chunk_seconds=args.chunk_seconds,
                           length_quantum_seconds=args.seconds,
                           mesh=mesh)

    load_mel = None
    if args.mel_load:
        n_load = int(args.seconds * cfg.sample_rate)
        frames = n_load // cfg.mel.hop_length + 1
        load_mel = np.random.default_rng(11).normal(
            size=(frames, cfg.mel.num_mels)).astype(np.float32)
        # warm the conditioned lane's executable for this signature
        engine.synthesize(seconds=args.seconds, mel=load_mel)

    lat, ttfc, wall = run_load(engine, args.clients, args.requests,
                               args.seconds, args.stagger_ms, mel=load_mel)
    report("mel-load" if args.mel_load else "pure", lat, ttfc, wall,
           args.requests, args.clients, args.seconds)
    base_p95_ttfc = pct(ttfc, 95)

    if args.mixed:
        n_mel = int(args.mel_seconds * cfg.sample_rate)
        frames = n_mel // cfg.mel.hop_length
        mel = np.random.default_rng(7).normal(
            size=(frames, cfg.mel.num_mels)).astype(np.float32)
        # warm the singleton-lane executable before measuring
        engine.synthesize(num_samples=frames * cfg.mel.hop_length, mel=mel)

        stop = threading.Event()
        mel_done = []

        def mel_client():
            while not stop.is_set():
                t0 = time.perf_counter()
                engine.submit(num_samples=frames * cfg.mel.hop_length,
                              mel=mel, seed=9).waveform()
                mel_done.append(time.perf_counter() - t0)

        bg = threading.Thread(target=mel_client)
        bg.start()
        try:
            lat2, ttfc2, wall2 = run_load(
                engine, args.clients, args.requests, args.seconds,
                args.stagger_ms, seed0=10_000)
        finally:
            stop.set()
            bg.join()
        report("mixed (long mel in flight)", lat2, ttfc2, wall2,
               args.requests, args.clients, args.seconds)
        mixed_p95 = pct(ttfc2, 95)
        print(f"\nmel decodes completed during load: {len(mel_done)} "
              f"(p50 {pct(mel_done, 50)*1e3:.0f} ms)" if mel_done else
              "\nmel decode still in flight at end (one long request)")
        ratio = mixed_p95 / base_p95_ttfc
        print(f"batchable first-chunk p95: pure {base_p95_ttfc*1e3:.1f} ms "
              f"vs mixed {mixed_p95*1e3:.1f} ms -> {ratio:.2f}x "
              f"({'OK (within 20%)' if ratio <= 1.2 else 'DEGRADED'})")

    engine.close()
    s = engine.stats
    print(f"batching     {s['batches']} batches for {s['requests']} "
          f"requests ({s['requests'] / max(1, s['batches']):.2f} "
          f"req/batch; {s['padded_rows']} padded rows)")


if __name__ == "__main__":
    main()
