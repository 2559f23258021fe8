"""Training-quality evidence for GLOBAL CONDITIONING (speaker id).

Trains a small-preset variant with global_classes=4 on the synthetic
multi-speaker corpus (tools/make_speechlike_corpus.py with N_SPK=4: each
speaker has a fixed f0 register and formant scale), then produces two
quantitative proofs that the conditioning is learned and controls synthesis:

  1. score confusion matrix: held-out windows of speaker i scored
     (bits/sample, models.wavenet.score_fn) under every speaker id j —
     the diagonal must be the row minimum;
  2. per-speaker free-running samples: generate with speaker=s and measure
     the dominant f0 by autocorrelation — must track speaker s's register.

Artifacts under runs/evidence/global_cond/: metrics.jsonl, confusion.json,
f0.json, spk{0..3}.wav, README.md.

Usage: python tools/gc_evidence.py [steps]   (default 20000; TPU)
       python tools/gc_evidence.py resume    (skip training, redo evidence
                                              from the saved checkpoint)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np                                          # noqa: E402

RESUME = len(sys.argv) > 1 and sys.argv[1] == "resume"
STEPS = (int(sys.argv[1]) if len(sys.argv) > 1 and not RESUME else 20000)
CORPUS = "runs/corpus_ms"
OUT = "runs/evidence/global_cond"
N_SPK = 4


def ensure_corpus():
    if os.path.isdir(os.path.join(CORPUS, "spk0")):
        return
    import subprocess
    subprocess.run([sys.executable, "tools/make_speechlike_corpus.py",
                    CORPUS, "64", "4.0", str(N_SPK)], check=True)


def f0_autocorr(x, sr, lo=60.0, hi=450.0):
    """Dominant f0 via energy-weighted autocorrelation over voiced frames."""
    n = 2048
    hop = 512
    lags = np.arange(int(sr / hi), int(sr / lo))
    best = []
    for s in range(0, len(x) - n, hop):
        seg = x[s:s + n].astype(np.float64)
        e = np.sqrt(np.mean(seg ** 2))
        if e < 0.008:                     # skip silence/noise-floor frames
            continue
        seg = seg - seg.mean()
        ac = np.correlate(seg, seg, "full")[n - 1:]
        ac = ac / (ac[0] + 1e-9)
        pk = lags[np.argmax(ac[lags])]
        if ac[pk] > 0.25:                 # voiced only
            best.append(sr / pk)
    return float(np.median(best)) if best else float("nan")


def main():
    import jax
    import jax.numpy as jnp

    from wavenet_tpu.audio.dataset import AudioDataset, IteratorState
    from wavenet_tpu.audio.io import write_wav
    from wavenet_tpu.config import small
    from wavenet_tpu.generate.sampler import generate_auto
    from wavenet_tpu.models import wavenet as wn
    from wavenet_tpu.training.trainer import Trainer

    ensure_corpus()
    os.makedirs(OUT, exist_ok=True)
    cfg = small().replace(global_classes=N_SPK, global_channels=16,
                          lr_schedule="cosine", lr_decay_steps=STEPS)
    ds = AudioDataset.from_dir(CORPUS, cfg)
    print(f"corpus: {len(ds.tokens)} clips, speakers "
          f"{np.bincount(ds.speakers, minlength=N_SPK)}", flush=True)

    if RESUME:
        from wavenet_tpu.models.api import WaveNet
        params = WaveNet.from_checkpoint(os.path.join(OUT, "ckpt")).params
        last = {}
        if os.path.exists(os.path.join(OUT, "metrics.jsonl")):
            for line in open(os.path.join(OUT, "metrics.jsonl")):
                last = json.loads(line)
        print("resumed from checkpoint; last metrics:", last, flush=True)
    else:
        tr = Trainer(cfg, ds, checkpoint_dir=os.path.join(OUT, "ckpt"))
        mf = open(os.path.join(OUT, "metrics.jsonl"), "w")

        def metrics_hook(step, m):
            mf.write(json.dumps({"step": step, **m}) + "\n")
            mf.flush()

        last = tr.run(STEPS, log_every=500, metrics_fn=metrics_hook)
        tr.save()
        mf.close()
        print("final:", {k: round(v, 4) for k, v in last.items()},
              flush=True)
        params = tr.state.params

    # --- 1. score confusion matrix (held-out deterministic windows) ---
    W = cfg.train_window
    per_spk_windows = 8
    rng = np.random.default_rng(987)
    conf = np.zeros((N_SPK, N_SPK))
    score = jax.jit(lambda p, t, s: wn.score_fn(p, cfg, t, speaker=s))
    for i in range(N_SPK):
        clips = [k for k, s in enumerate(ds.speakers) if s == i]
        wins = []
        for _ in range(per_spk_windows):
            ci = int(rng.choice(clips))
            st = int(rng.integers(0, len(ds.tokens[ci]) - (W + 1)))
            wins.append(ds.tokens[ci][st:st + W + 1])
        wins = jnp.asarray(np.stack(wins))                  # [8, W+1]
        for j in range(N_SPK):
            sj = jnp.full((wins.shape[0],), j, jnp.int32)
            conf[i, j] = float(jnp.mean(score(params, wins, sj)))
    diag_best = all(np.argmin(conf[i]) == i for i in range(N_SPK))
    print("confusion (bits/sample):\n", np.round(conf, 3), flush=True)
    print("diagonal is row-min:", diag_best, flush=True)
    json.dump({"bits_per_sample": conf.tolist(),
               "diagonal_is_row_min": diag_best},
              open(os.path.join(OUT, "confusion.json"), "w"), indent=1)

    # --- 2. per-speaker samples + f0 ---
    # Prime each sample with 0.25 s of held-out audio FROM THAT SPEAKER so
    # the free-run starts voiced (the corpus is ~25% silence, and an
    # unprimed zero-context rollout can legitimately stay silent); the f0 is
    # measured on the 2 s CONTINUATION only, which the model generates.
    P = int(0.25 * cfg.sample_rate)
    n = int(2.0 * cfg.sample_rate)
    f0s = {}
    from wavenet_tpu.audio import mulaw
    for s in range(N_SPK):
        k = [k for k, sp in enumerate(ds.speakers) if sp == s][-1]
        prime = jnp.asarray(ds.tokens[k][:P][None])
        toks = generate_auto(params, cfg, jax.random.PRNGKey(300 + s), n,
                             batch=1, prime_tokens=prime,
                             speaker=jnp.full((1,), s, jnp.int32),
                             temperature=0.9)
        wave = np.asarray(mulaw.decode(toks, cfg.quantization_channels))[0]
        write_wav(os.path.join(OUT, f"spk{s}.wav"), wave, cfg.sample_rate)
        f0s[f"spk{s}"] = f0_autocorr(wave, cfg.sample_rate)
    # corpus ground truth per speaker for comparison
    truth = {}
    for s in range(N_SPK):
        k = next(k for k, sp in enumerate(ds.speakers) if sp == s)
        truth[f"spk{s}"] = f0_autocorr(ds.waveforms[k], cfg.sample_rate)
    print("generated f0:", f0s, flush=True)
    print("corpus f0:   ", truth, flush=True)
    json.dump({"generated": f0s, "corpus": truth},
              open(os.path.join(OUT, "f0.json"), "w"), indent=1)

    with open(os.path.join(OUT, "README.md"), "w") as f:
        f.write(
            "# Global-conditioning evidence\n\n"
            f"`small` preset + `global_classes={N_SPK}`, {STEPS} steps on the "
            f"4-speaker synthetic corpus (`tools/make_speechlike_corpus.py "
            f"{CORPUS} 64 4.0 4`), one v5e chip.\n\n"
            f"- final: loss {last.get('loss', float('nan')):.3f} nats, "
            f"accuracy {last.get('accuracy', float('nan')):.3f}\n"
            f"- score confusion (bits/sample, rows=true speaker, "
            f"cols=conditioned id): see `confusion.json`; diagonal is the "
            f"row minimum: **{diag_best}**\n"
            f"- samples `spk*.wav`: primed with 0.25 s of held-out audio "
            f"from the same speaker, then 2 s free-run conditioned on that "
            f"speaker id; measured continuation f0 vs corpus f0: see "
            f"`f0.json`\n")
    print("evidence written to", OUT, flush=True)


if __name__ == "__main__":
    main()
