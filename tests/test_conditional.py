"""Conditional (mel-vocoder) model tests — BASELINE config 5, WaveNet paper
§2.5 eq.3.  Gates: upsampler alignment, conditioned training runs and
learns, fast-decode-with-conditioning == full-forward logits, sharded
conditional grads == single-device."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_tpu.audio import mel as mel_lib
from wavenet_tpu.audio.dataset import AudioDataset
from wavenet_tpu.config import MelConfig, WaveNetConfig
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.models.conditioning import prepare_decode_cond, upsample_mel


MEL = MelConfig(num_mels=8, hop_length=16, win_length=64, fmax=4000.0,
                upsample_factors=(4, 4))


def cfg_(**kw):
    base = dict(num_blocks=1, max_dilation=8, residual_channels=8,
                skip_channels=8, compute_dtype="float32", mel=MEL,
                batch_size=2, train_window=128, learning_rate=3e-3)
    base.update(kw)
    return WaveNetConfig(**base)


def test_mel_extraction_shapes():
    x = np.random.RandomState(0).uniform(-1, 1, 1600).astype(np.float32)
    m = mel_lib.log_mel(x, 16000, MEL)
    assert m.shape == (mel_lib.frames_for_samples(1600, MEL.hop_length),
                       MEL.num_mels)
    assert np.isfinite(m).all()


def test_upsampler_alignment():
    cfg = cfg_()
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    F, T = 8, 128
    mel = jnp.ones((2, F, MEL.num_mels))
    y = upsample_mel(p["upsampler"], MEL, mel, T)
    assert y.shape == (2, T, MEL.num_mels)
    # constant input -> (near-)constant output away from conv edges
    mid = np.asarray(y[:, 20:-20, :])
    assert np.abs(mid - mid.mean(axis=1, keepdims=True)).max() < 1e-3


def test_conditioning_changes_logits():
    cfg = cfg_()
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, 256)
    mel_a = jnp.zeros((2, 4, MEL.num_mels))
    mel_b = jnp.ones((2, 4, MEL.num_mels)) * 2.0
    la = wn.forward_logits(p, cfg, toks, mel=mel_a)
    lb = wn.forward_logits(p, cfg, toks, mel=mel_b)
    assert float(jnp.abs(la - lb).max()) > 1e-4


def test_fast_decode_matches_forward_with_cond():
    cfg = cfg_()
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    B, T = 2, 64
    toks = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, 256)
    mel = jax.random.normal(jax.random.PRNGKey(2), (B, 4, MEL.num_mels))

    naive = wn.forward_logits(p, cfg, toks, mel=mel)

    cond = prepare_decode_cond(p, cfg, mel, T)       # [B, T, L, 2, R]
    st = wn.decode_init(cfg, B)

    def body(carry, inp):
        st = carry
        tok, c = inp
        st, logits = wn.decode_step(p, cfg, st, tok, cond_t=c)
        return st, logits

    _, fast = jax.lax.scan(
        body, st, (jnp.moveaxis(toks, 1, 0), jnp.moveaxis(cond, 1, 0)))
    fast = jnp.moveaxis(fast, 0, 1)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(naive),
                               atol=1e-5, rtol=1e-5)


def test_conditional_training_learns():
    cfg = cfg_()
    from wavenet_tpu.training.trainer import Trainer
    ds = AudioDataset.synthetic(cfg, num_clips=1, clip_seconds=0.1)
    assert ds.mels is not None
    tr = Trainer(cfg, ds)
    m = tr.run(num_steps=100, log_every=0)
    assert np.isfinite(m["loss"])
    assert m["loss"] < 5.3                     # moving off the ln(256)=5.55 init


def test_conditional_sharded_grads_match():
    cfg = cfg_(model_parallel=4, data_parallel=2)
    from wavenet_tpu.parallel import sharding as shd
    from wavenet_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(cfg)
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, 256)
    mel = jax.random.normal(jax.random.PRNGKey(2), (2, 4, MEL.num_mels))

    ref_loss, ref_grads = jax.value_and_grad(
        lambda p: wn.loss_fn(p, cfg, toks, mel=mel)[0])(p)

    p_s = jax.device_put(p, shd.param_shardings(cfg, mesh))
    loss, grads = jax.jit(jax.value_and_grad(
        lambda p: wn.loss_fn(p, cfg, toks, mel=mel)[0]))(p_s)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-6)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(ref_grads)[0],
            jax.tree_util.tree_flatten_with_path(grads)[0]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-5, rtol=1e-4, err_msg=str(ka))


def test_generate_with_cond_runs():
    cfg = cfg_()
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    B, N = 2, 32
    mel = jax.random.normal(jax.random.PRNGKey(2), (B, 2, MEL.num_mels))
    cond = prepare_decode_cond(p, cfg, mel, N)
    out = wn.generate(p, cfg, jax.random.PRNGKey(5), num_samples=N,
                      batch=B, cond=cond)
    assert out.shape == (B, N)


def test_generate_priming_with_cond_matches_manual():
    """Priming + conditioning together (advisor r1 #2): the queues must be
    built WITH the conditioning contribution during teacher-forced priming,
    and the cond timeline must span priming steps.  Reference is a manual
    decode_step loop replicating generate()'s key folding."""
    cfg = cfg_()
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    B, P, N = 2, 16, 24
    key = jax.random.PRNGKey(7)
    prime = jax.random.randint(jax.random.PRNGKey(3), (B, P), 0, 256)
    total = P - 1 + N
    mel = jax.random.normal(jax.random.PRNGKey(2), (B, 4, MEL.num_mels))
    cond = prepare_decode_cond(p, cfg, mel, total)

    got = wn.generate(p, cfg, key, num_samples=N, batch=B,
                      prime_tokens=prime, cond=cond)

    # manual reference: teacher-force prime[:-1] WITH cond, then sample
    st = wn.decode_init(cfg, B)
    for t in range(P - 1):
        st, _ = wn.decode_step(p, cfg, st, prime[:, t], cond_t=cond[:, t])
    tok = prime[:, -1]
    outs = []
    for i in range(N):
        st, logits = wn.decode_step(p, cfg, st, tok, cond_t=cond[:, st.t])
        k = jax.random.fold_in(key, i)
        tok = jax.random.categorical(k, logits, axis=-1).astype(jnp.int32)
        outs.append(tok)
    want = jnp.stack(outs, axis=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_generate_cond_too_short_raises():
    cfg = cfg_()
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    B, P, N = 2, 16, 24
    prime = jax.random.randint(jax.random.PRNGKey(3), (B, P), 0, 256)
    mel = jax.random.normal(jax.random.PRNGKey(2), (B, 4, MEL.num_mels))
    cond = prepare_decode_cond(p, cfg, mel, N)       # misses priming steps
    with pytest.raises(ValueError, match="cond covers"):
        wn.generate(p, cfg, jax.random.PRNGKey(5), num_samples=N, batch=B,
                    prime_tokens=prime, cond=cond)


def test_facade_generate_mel_with_priming():
    """WaveNet.generate sizes the cond timeline to cover priming."""
    from wavenet_tpu.models.api import WaveNet
    cfg = cfg_()
    m = WaveNet(cfg).init()
    B, P, N = 2, 8, 16
    prime = jax.random.randint(jax.random.PRNGKey(3), (B, P), 0, 256)
    # mel long enough for P-1+N upsampled samples: frames >= ceil(total/hop)
    need_frames = (P - 1 + N + MEL.hop_length - 1) // MEL.hop_length + 1
    mel = jax.random.normal(jax.random.PRNGKey(2), (B, need_frames,
                                                    MEL.num_mels))
    out = m.generate(num_samples=N, batch=B, prime_tokens=prime, mel=mel)
    assert out.shape == (B, N)


def test_facade_vocode():
    """WaveNet.vocode: one call from waveform -> mel -> conditioned tokens."""
    import numpy as np
    from wavenet_tpu.models.api import WaveNet
    cfg = cfg_()
    m = WaveNet(cfg).init()
    t = np.arange(int(0.12 * cfg.sample_rate)) / cfg.sample_rate
    wave = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    toks = m.vocode(wave)
    F = len(wave) // cfg.mel.hop_length
    assert toks.shape == (1, F * cfg.mel.hop_length)
    assert 0 <= int(toks.min()) and int(toks.max()) < cfg.quantization_channels


def test_facade_generate_wav_mel(tmp_path):
    """WaveNet.generate_wav passes mel conditioning through to the decoder
    (was silently unconditioned) and writes the file."""
    import os
    import numpy as np
    from wavenet_tpu.models.api import WaveNet
    cfg = cfg_()
    m = WaveNet(cfg).init()
    seconds = 24 / cfg.sample_rate                 # 24 samples
    need_frames = 24 // MEL.hop_length + 2
    mel = jax.random.normal(jax.random.PRNGKey(2),
                            (1, need_frames, MEL.num_mels))
    path = str(tmp_path / "v.wav")
    wave = m.generate_wav(path, seconds=seconds, mel=mel)
    assert os.path.exists(path) and wave.shape == (1, 24)
    # mel actually reaches the decoder: a different mel changes the output
    mel2 = jax.random.normal(jax.random.PRNGKey(9),
                             (1, need_frames, MEL.num_mels)) * 3.0
    wave2 = m.generate_wav(str(tmp_path / "v2.wav"), seconds=seconds,
                           mel=mel2)
    assert not np.array_equal(wave, wave2)
