"""Generate a synthetic speech-like wav corpus (no speech data ships in this
image, so training-quality evidence uses formant-synthesized pseudo-speech:
a glottal pulse train with drifting f0, filtered through 2-3 slowly-moving
formant resonators, interleaved with unvoiced noise bursts and silences —
speech-like spectro-temporal structure without being any real utterance).

Usage: python tools/make_speechlike_corpus.py OUT_DIR [n_clips] [seconds]
       python tools/make_speechlike_corpus.py OUT_DIR n_clips seconds N_SPK

With N_SPK, clips are split across N_SPK synthetic "speakers" written to
OUT_DIR/spk{i}/ (the loaders' multi-speaker layout): each speaker has a
fixed f0 register and vocal-tract (formant-scale) identity, so a
global-conditioned model can and must learn per-speaker acoustics.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scipy.signal import lfilter                            # noqa: E402

from wavenet_tpu.audio.io import write_wav                  # noqa: E402

SR = 16000


def formant_filter(x, freq, bw, sr=SR):
    """2nd-order resonator at freq Hz with bandwidth bw."""
    r = np.exp(-np.pi * bw / sr)
    theta = 2 * np.pi * freq / sr
    a = [1.0, -2 * r * np.cos(theta), r * r]
    return lfilter([1.0 - r], a, x)


def voiced_segment(rng, n, f0_start, f0_end, formant_scale=1.0):
    """Glottal-ish pulse train with drifting f0 through drifting formants."""
    f0 = np.linspace(f0_start, f0_end, n)
    phase = np.cumsum(f0) / SR
    pulses = (np.diff(np.floor(phase), prepend=0.0) > 0).astype(np.float32)
    # soften pulses (approximate glottal flow derivative)
    pulses = lfilter([1.0], [1.0, -0.96], pulses).astype(np.float32)
    out = np.zeros(n, np.float32)
    # three formants with slow random walks (rough vowel space)
    f1 = rng.uniform(300, 850) * formant_scale
    f2 = rng.uniform(900, 2300) * formant_scale
    f3 = rng.uniform(2400, 3200) * formant_scale
    for freq, bw, g in ((f1, 80, 1.0), (f2, 110, 0.6), (f3, 170, 0.3)):
        drift = np.linspace(0, rng.uniform(-0.12, 0.12) * freq, n)
        seg = formant_filter(pulses, freq + drift.mean(), bw)
        out += g * seg.astype(np.float32)
    return out


def unvoiced_segment(rng, n):
    noise = rng.normal(0, 1, n).astype(np.float32)
    freq = rng.uniform(2000, 6000)
    return 0.25 * formant_filter(noise, freq, 1500).astype(np.float32)


# (f0_lo, f0_hi, formant_scale, voiced_frac): well-separated registers so a
# conditioned model's per-speaker acoustics are measurable from samples
SPEAKER_VOICES = [
    (85, 115, 0.85, 0.70),
    (140, 180, 1.00, 0.60),
    (210, 260, 1.15, 0.55),
    (300, 380, 1.30, 0.50),
]


def make_clip(rng, seconds, voice=None):
    total = int(seconds * SR)
    out = np.zeros(total, np.float32)
    f0_lo, f0_hi, fsc, vfrac = (voice if voice is not None
                                else (90, 240, 1.0, 0.55))
    pos = 0
    while pos < total:
        kind = rng.random()
        n = min(int(rng.uniform(0.08, 0.35) * SR), total - pos)
        if kind < vfrac:
            f0a = rng.uniform(f0_lo, f0_hi)
            f0b = np.clip(f0a * rng.uniform(0.8, 1.25),
                          0.9 * f0_lo, 1.1 * f0_hi)
            seg = voiced_segment(rng, n, f0a, f0b, formant_scale=fsc)
        elif kind < vfrac + 0.25:
            seg = unvoiced_segment(rng, n)
        else:
            seg = np.zeros(n, np.float32)
        # 10ms fades to avoid clicks
        f = min(160, n // 2)
        if f:
            w = np.linspace(0, 1, f, dtype=np.float32)
            seg[:f] *= w
            seg[-f:] *= w[::-1]
        out[pos:pos + n] = seg
        pos += n
    peak = np.abs(out).max() + 1e-6
    return (0.5 * out / peak).astype(np.float32)


def main():
    out_dir = sys.argv[1]
    n_clips = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 8.0
    n_spk = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    rng = np.random.default_rng(42)
    if n_spk:
        assert n_spk <= len(SPEAKER_VOICES), "add more SPEAKER_VOICES"
        for s in range(n_spk):
            d = os.path.join(out_dir, f"spk{s}")
            os.makedirs(d, exist_ok=True)
            for i in range(n_clips // n_spk):
                clip = make_clip(rng, seconds, voice=SPEAKER_VOICES[s])
                write_wav(os.path.join(d, f"clip_{i:04d}.wav"), clip, SR)
        print(f"wrote {n_spk} speakers x {n_clips // n_spk} x {seconds}s "
              f"clips to {out_dir}")
        return
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n_clips):
        clip = make_clip(rng, seconds)
        write_wav(os.path.join(out_dir, f"clip_{i:04d}.wav"), clip, SR)
    print(f"wrote {n_clips} x {seconds}s clips to {out_dir}")


if __name__ == "__main__":
    main()
