"""Distributed AR generation (P3, parallel/distdecode.py): sharded decode
over the (data, model) mesh must sample the SAME tokens as a single-device
run — the counter-based sampling noise is keyed by global coordinates, so
any mesh layout is token-equivalent.  BASELINE north_star: "generation
exchanges cached conv states and sampled tokens via collectives"."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_tpu.config import WaveNetConfig
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.parallel import distdecode as dd
from wavenet_tpu.parallel.mesh import make_mesh


def cfg_(**kw):
    base = dict(num_blocks=1, max_dilation=8, residual_channels=16,
                skip_channels=16, compute_dtype="float32",
                batch_size=4, train_window=128)
    base.update(kw)
    return WaveNetConfig(**base)


def single_run(cfg, p, seed, n, batch, **kw):
    mesh1 = make_mesh(cfg_(), devices=jax.devices()[:1])
    return dd.generate_sharded(p, cfg_base_strip(cfg), mesh1, seed, n,
                               batch, **kw)


def cfg_base_strip(cfg):
    return cfg.replace(data_parallel=1, model_parallel=1, seq_parallel=1)


@pytest.mark.parametrize("dp,mp", [(4, 1), (1, 4), (2, 2), (2, 4)])
def test_sharded_tokens_match_single_device(dp, mp):
    cfg = cfg_(data_parallel=dp, model_parallel=mp)
    mesh = make_mesh(cfg)
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    ref = single_run(cfg, p, seed=7, n=40, batch=4)
    got = dd.generate_sharded(p, cfg, mesh, 7, 40, batch=4)
    assert got.shape == (4, 40)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("dp,mp", [(1, 4), (2, 2)])
def test_model_sharded_rings_match(dp, mp):
    """shard_rings_model: conv caches shard channels over `model` and every
    read reconstitutes them via all_gather — tokens must be unchanged."""
    cfg = cfg_(data_parallel=dp, model_parallel=mp)
    mesh = make_mesh(cfg)
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    ref = single_run(cfg, p, seed=3, n=32, batch=4)
    got = dd.generate_sharded(p, cfg, mesh, 3, 32, batch=4,
                              shard_rings_model=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_priming_matches_single_device():
    cfg = cfg_(data_parallel=2, model_parallel=2)
    mesh = make_mesh(cfg)
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    prime = jax.random.randint(jax.random.PRNGKey(2), (4, 12), 0, 256)
    ref = single_run(cfg, p, seed=5, n=24, batch=4, prime_tokens=prime)
    got = dd.generate_sharded(p, cfg, mesh, 5, 24, batch=4,
                              prime_tokens=prime)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_greedy_matches_canonical_decoder():
    """temperature=0 sharded decode == a manual argmax loop over the
    canonical wn.decode_step — ties the sharded math to the reference
    fast decoder, not just to itself."""
    cfg = cfg_(data_parallel=2, model_parallel=2)
    mesh = make_mesh(cfg)
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    B, N = 4, 24
    got = dd.generate_sharded(p, cfg, mesh, 0, N, batch=B, temperature=0.0)

    st = wn.decode_init(cfg, B)
    tok = jnp.full((B,), cfg.quantization_channels // 2, jnp.int32)
    outs = []
    for _ in range(N):
        st, logits = wn.decode_step(p, cfg, st, tok)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        outs.append(tok)
    want = jnp.stack(outs, axis=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_dp_matches_per_shard_kernel():
    """generate_pallas_dp (interpret): each data shard's tokens equal a
    standalone kernel run with that shard's key and batch slice."""
    cfg = cfg_(compute_dtype="bfloat16")
    cfg = cfg.replace(data_parallel=4)
    mesh = make_mesh(cfg)
    from wavenet_tpu.ops.pallas import decode as pdec
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(9)
    B, N = 8, 16
    got = dd.generate_pallas_dp(p, cfg, mesh, key, N, batch=B,
                                interpret=True)
    assert got.shape == (B, N)
    per = B // 4
    for i in range(4):
        ki = jax.random.fold_in(key, i)
        want = pdec.generate_pallas(p, cfg, ki, N, batch=per,
                                    interpret=True)
        np.testing.assert_array_equal(np.asarray(got[i * per:(i + 1) * per]),
                                      np.asarray(want), err_msg=f"shard {i}")


@pytest.mark.parametrize("dp,mp", [(4, 1), (2, 2)])
def test_conditional_sharded_matches_single_device(dp, mp):
    """Mel-conditioned distributed decode: each shard projects its step's
    features with the LOCAL v_cond column slice (aligned with the local z
    columns); tokens must equal the single-device run."""
    from wavenet_tpu.config import MelConfig
    from wavenet_tpu.models.conditioning import upsample_mel
    mel_cfg = MelConfig(num_mels=8, hop_length=16, win_length=64,
                        fmax=4000.0, upsample_factors=(4, 4))
    cfg = cfg_(data_parallel=dp, model_parallel=mp, mel=mel_cfg)
    base = cfg_base_strip(cfg)
    mesh = make_mesh(cfg)
    mesh1 = make_mesh(base, devices=jax.devices()[:1])
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    n, P = 32, 9
    mel = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 8))
    y = upsample_mel(p["upsampler"], mel_cfg, mel, P - 1 + n)
    prime = jax.random.randint(jax.random.PRNGKey(3), (4, P), 0, 256)

    ref = dd.generate_sharded(p, base, mesh1, 5, n, batch=4,
                              prime_tokens=prime, y=y)
    got = dd.generate_sharded(p, cfg, mesh, 5, n, batch=4,
                              prime_tokens=prime, y=y)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # and the conditioning must actually matter
    bare = dd.generate_sharded(p, base, mesh1, 5, n, batch=4,
                               prime_tokens=prime, y=y * 0.0)
    assert not np.array_equal(np.asarray(ref), np.asarray(bare))


def test_counter_uniform_full_range():
    """Regression: int32 demotion in the murmur mix cleared the sign bit
    and squeezed the 'uniform' noise into (0, 0.5), truncating the Gumbel
    right tail — low-logit tokens could never win a sample."""
    u = np.asarray(dd.counter_uniform(
        jnp.int32(7), jnp.int32(3), jnp.int32(0), jnp.int32(0), (64, 128)))
    assert u.min() > 0.0 and u.max() < 1.0
    assert u.max() > 0.5, f"noise capped at {u.max()} — sign-bit demotion?"
    assert 0.4 < u.mean() < 0.6


def test_facade_mesh_routing():
    """WaveNet.generate(mesh=...) routes through the distributed decoder and
    reproduces the library call exactly (layout-independent counter RNG);
    committed (checkpoint-style) params are re-placed onto the mesh."""
    from wavenet_tpu.models.api import WaveNet
    cfg = cfg_(data_parallel=2, model_parallel=2)
    m = WaveNet(cfg_base_strip(cfg)).init(jax.random.PRNGKey(0))
    mesh = make_mesh(cfg)
    got = m.generate(num_samples=40, batch=2, mesh=mesh, seed=11)
    ref = single_run(cfg, m.params, 11, 40, 2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # committed params (the from_checkpoint situation): same result
    committed = jax.device_put(m.params, jax.devices()[0])
    got2 = dd.generate_sharded(committed, cfg_base_strip(cfg), mesh, 11, 40,
                               batch=2)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(ref))


def test_generate_cli_distributed(tmp_path):
    """generate.py --data-parallel/--model-parallel produce the same audio
    as a single-device distributed run at the same seed."""
    import sys
    from unittest import mock
    from wavenet_tpu.audio.dataset import AudioDataset
    from wavenet_tpu.audio import mulaw
    from wavenet_tpu.audio.io import read_wav
    from wavenet_tpu.training.trainer import Trainer
    cfg = cfg_base_strip(cfg_())
    d = str(tmp_path / "ckpt")
    tr = Trainer(cfg, AudioDataset.synthetic(cfg, num_clips=2),
                 checkpoint_dir=d)
    tr.run(num_steps=1, log_every=0)
    tr.save()
    tr.ckpt.wait()

    import generate as gen_cli
    out = str(tmp_path / "o.wav")
    argv = ["--ckpt", d, "--seconds", "0.005", "--out", out,
            "--model-parallel", "2", "--data-parallel", "2",
            "--batch", "2", "--seed", "3"]
    toks = gen_cli.main(argv)
    n = toks.shape[1]
    from wavenet_tpu.models.api import WaveNet
    m = WaveNet.from_checkpoint(d)
    ref = single_run(cfg, m.params, 3, n, 2)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))
    w0, _ = read_wav(str(tmp_path / "o_0.wav"), cfg.sample_rate)
    exp = np.asarray(mulaw.decode(ref, cfg.quantization_channels))[0]
    np.testing.assert_allclose(w0, exp, atol=2.0 / 32767)
