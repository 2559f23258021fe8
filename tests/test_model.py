"""Model-core unit tests (SURVEY.md §4): causality via gradient masking,
receptive-field formula, gate/residual math vs a tiny NumPy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_tpu.config import WaveNetConfig, tiny
from wavenet_tpu.models import wavenet as wn


def small_cfg(**kw):
    base = dict(num_blocks=1, max_dilation=8, residual_channels=8,
                skip_channels=8, compute_dtype="float32")
    base.update(kw)
    return WaveNetConfig(**base)


def test_receptive_field_formula():
    cfg = small_cfg()
    # layers d=1,2,4,8 => sum=15; +1 for the embed conv; (k-1)=1 => RF=17
    assert cfg.dilations == (1, 2, 4, 8)
    assert cfg.receptive_field == 17
    assert tiny().receptive_field == 257
    full = WaveNetConfig(num_blocks=4, max_dilation=512,
                         residual_channels=8, skip_channels=8)
    assert full.receptive_field == 4 * 1023 + 2


def test_causality_gradient_masking():
    """output[t] must not depend on input[>t]: perturb a suffix of the input
    tokens and check logits before the perturbation point are unchanged."""
    cfg = small_cfg()
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    T = 64
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, T), 0, 256)
    base = wn.forward_logits(p, cfg, toks)
    cut = 40
    toks2 = toks.at[:, cut:].set((toks[:, cut:] + 77) % 256)
    pert = wn.forward_logits(p, cfg, toks2)
    np.testing.assert_allclose(base[:, :cut], pert[:, :cut], atol=1e-6)
    # and the perturbation DOES change later outputs (sanity)
    assert float(jnp.abs(base[:, cut:] - pert[:, cut:]).max()) > 1e-4


def test_rf_exactness():
    """logits[t] depends on exactly the last RF inputs: changing input at
    t-RF+1 must affect logits[t]; changing at t-RF must not."""
    cfg = small_cfg()
    rf = cfg.receptive_field
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    T = rf + 8
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, T), 0, 256)
    t = T - 1
    base = wn.forward_logits(p, cfg, toks)[0, t]

    inside = toks.at[0, t - rf + 1].set((toks[0, t - rf + 1] + 99) % 256)
    assert float(jnp.abs(wn.forward_logits(p, cfg, inside)[0, t] - base).max()) > 1e-5

    outside = toks.at[0, t - rf].set((toks[0, t - rf] + 99) % 256)
    np.testing.assert_allclose(wn.forward_logits(p, cfg, outside)[0, t], base,
                               atol=1e-6)


def test_gate_math_vs_numpy_oracle():
    """One layer's gated residual block against a literal NumPy transcription
    of WaveNet paper eq.2 (z = tanh(Wf*x) . sigmoid(Wg*x))."""
    cfg = small_cfg(max_dilation=1)   # single layer, d=1
    R, S = cfg.residual_channels, cfg.skip_channels
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    B, T = 2, 16
    toks = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, 256)
    got = np.asarray(wn.forward_logits(p, cfg, toks))

    # ---- NumPy oracle ----
    pn = jax.tree.map(np.asarray, p)
    tn = np.asarray(toks)
    prev = np.pad(tn[:, :-1], ((0, 0), (1, 0)))
    x = pn["embed_cur"][tn] + pn["embed_prev"][prev]          # [B,T,R]
    xprev = np.concatenate([np.zeros_like(x[:, :1]), x[:, :-1]], 1)  # d=1 shift
    z = (np.einsum("btr,rgs->btgs", x, pn["w_cur"][0])
         + np.einsum("btr,rgs->btgs", xprev, pn["w_prev"][0]) + pn["b"][0])
    h = np.tanh(z[..., 0, :]) * (1 / (1 + np.exp(-z[..., 1, :])))
    skip = h @ pn["w_skip"][0] + pn["b_skip"][0]
    relu = lambda v: np.maximum(v, 0)
    out = relu(relu(skip) @ pn["head_w1"] + pn["head_b1"]) @ pn["head_w2"] + pn["head_b2"]
    np.testing.assert_allclose(got, out, atol=1e-4, rtol=1e-4)


def test_loss_at_init_is_log_q():
    cfg = small_cfg()
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 128), 0, 256)
    loss, aux = wn.loss_fn(p, cfg, toks)
    assert abs(float(loss) - np.log(256)) < 0.1
    assert set(aux) == {"loss", "bits_per_sample", "accuracy"}


def test_bfloat16_path_runs():
    cfg = small_cfg(compute_dtype="bfloat16")
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, 256)
    logits = wn.forward_logits(p, cfg, toks)
    assert logits.dtype == jnp.float32          # head accumulates in f32
    assert np.isfinite(np.asarray(logits)).all()


def test_config_json_round_trip():
    cfg = tiny()
    cfg2 = WaveNetConfig.from_json(cfg.to_json())
    assert cfg == cfg2
    from wavenet_tpu.config import conditional
    c3 = conditional()
    assert WaveNetConfig.from_json(c3.to_json()) == c3


def test_remat_matches_no_remat():
    cfg = small_cfg()
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, 256)
    g1 = jax.grad(lambda p: wn.loss_fn(p, cfg, toks)[0])(p)
    cfg_r = small_cfg(remat=True)
    g2 = jax.grad(lambda p: wn.loss_fn(p, cfg_r, toks)[0])(p)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_wavenet_facade(tmp_path):
    import jax.numpy as jnp
    from wavenet_tpu import WaveNet

    cfg = small_cfg(batch_size=2, train_window=128)
    m = WaveNet(cfg).init()
    assert m.num_params > 0
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, 256)
    assert m.logits(toks).shape == (2, 64, 256)
    loss, aux = m.loss(toks)
    assert np.isfinite(float(loss))
    out = m.generate(num_samples=12, batch=2)
    assert out.shape == (2, 12)

    # round-trip through a checkpoint
    from wavenet_tpu.audio.dataset import AudioDataset
    from wavenet_tpu.training.trainer import Trainer
    ds = AudioDataset.synthetic(cfg, num_clips=1)
    tr = Trainer(cfg, ds, checkpoint_dir=str(tmp_path / "c"))
    tr.run(2, log_every=0); tr.save(); tr.ckpt.wait()
    m2 = WaveNet.from_checkpoint(str(tmp_path / "c"))
    assert m2.cfg == cfg
    assert m2.num_params == sum(x.size for x in jax.tree.leaves(tr.state.params))


def test_score_fn_per_utterance():
    """score_fn: [B] bits/sample; ~log2(Q)=8 at init, and the facade's
    waveform entry point agrees with explicit tokens."""
    from wavenet_tpu.models.api import WaveNet
    from wavenet_tpu.audio import mulaw
    cfg = tiny()
    m = WaveNet(cfg).init()
    toks = jax.random.randint(jax.random.PRNGKey(1), (3, 257), 0, 256)
    s = wn.score_fn(m.params, cfg, toks)
    assert s.shape == (3,)
    np.testing.assert_allclose(np.asarray(s), 8.0, atol=0.2)
    wave = mulaw.decode_np(np.asarray(toks), cfg.quantization_channels)
    s2 = m.score(waveform=wave)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s), atol=1e-4)


def test_facade_save_roundtrip(tmp_path):
    """WaveNet.save -> from_checkpoint round-trips params without a
    Trainer (e.g. persisting EMA-extracted or converted weights)."""
    from wavenet_tpu.models.api import WaveNet
    m = WaveNet(tiny()).init()
    m.save(str(tmp_path / "ck"))
    m2 = WaveNet.from_checkpoint(str(tmp_path / "ck"))
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(m.params)[0],
            jax.tree_util.tree_flatten_with_path(m2.params)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(ka))


def test_npz_export_import_roundtrip(tmp_path):
    """export_npz -> from_npz reproduces config and every param leaf
    bit-exactly (incl. nested subtrees), and the loaded model scores
    identically."""
    import dataclasses
    import jax
    import numpy as np
    from wavenet_tpu.config import MelConfig
    from wavenet_tpu.models.api import WaveNet

    cfg = dataclasses.replace(
        small_cfg(), mel=MelConfig(num_mels=8, hop_length=16, win_length=64,
                              upsample_factors=(4, 4)), global_classes=3)
    m = WaveNet(cfg).init(jax.random.PRNGKey(1))
    path = str(tmp_path / "model.npz")
    m.export_npz(path)

    m2 = WaveNet.from_npz(path)
    assert m2.cfg == cfg
    leaves1 = jax.tree_util.tree_flatten_with_path(m.params)[0]
    leaves2 = jax.tree_util.tree_flatten_with_path(m2.params)[0]
    assert [k for k, _ in leaves1] == [k for k, _ in leaves2]
    for (_, a), (_, b) in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
