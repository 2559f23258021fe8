"""Fused training-stack kernel vs the XLA scan path (SURVEY.md §4 "Kernel"):
forward skip-sums, logits, and EVERY gradient must match in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_tpu.config import WaveNetConfig
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.ops.pallas import train_stack as ts


def cfg_(**kw):
    base = dict(num_blocks=2, max_dilation=8, residual_channels=16,
                skip_channels=16, compute_dtype="bfloat16")
    base.update(kw)
    return WaveNetConfig(**base)


def test_supported_matrix():
    from wavenet_tpu.config import tiny, small, full, fastgen_bench
    assert ts.supported(tiny(), tiny().train_window)
    assert ts.supported(small(), small().train_window)
    assert ts.supported(fastgen_bench(), 8192)
    # full preset's f32 grad blocks exceed the VMEM budget for now
    assert not ts.supported(full(), full().train_window)
    # conditional falls back
    from wavenet_tpu.config import conditional
    c = conditional()
    assert not ts.supported(c, c.train_window)
    # indivisible T falls back
    assert not ts.supported(cfg_(), 100)


def test_forward_matches_scan():
    cfg = cfg_()
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    T = 64                                        # 2 tiles of TT=32? TT=maxd..
    # pick_tile: maxd=8 -> tt=512 -> halve until divides: 64
    assert ts.pick_tile(cfg, T) in (8, 16, 32, 64)
    toks = jax.random.randint(jax.random.PRNGKey(1), (3, T), 0, 256)

    ref = wn.forward_logits(p, cfg, toks)
    got = wn.forward_logits_fused(p, cfg, toks, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=0.05, rtol=0.02)


def test_grads_match_scan():
    cfg = cfg_()
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    T = 65
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, T), 0, 256)

    ref_loss, ref_g = jax.value_and_grad(
        lambda p: wn.loss_fn(p, cfg, toks)[0])(p)
    fused_loss, fused_g = jax.value_and_grad(
        lambda p: wn.loss_fn(p, cfg, toks, use_fused=True,
                             interpret=True)[0])(p)

    np.testing.assert_allclose(float(fused_loss), float(ref_loss),
                               atol=2e-3, rtol=1e-3)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(ref_g)[0],
            jax.tree_util.tree_flatten_with_path(fused_g)[0]):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b / scale, a / scale, atol=0.03,
                                   err_msg=str(ka))


def test_multi_tile_ring_carry():
    """Cross-tile ring carry: a small forced tile (nT=8) must equal the
    single-tile result and the scan reference."""
    cfg = cfg_()
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    T = 64
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, T), 0, 256)
    ref = wn.forward_logits(p, cfg, toks)
    got8 = wn.forward_logits_fused(p, cfg, toks, interpret=True, tile=8)
    np.testing.assert_allclose(np.asarray(got8), np.asarray(ref),
                               atol=0.05, rtol=0.02)


def test_multi_tile_grads_match():
    cfg = cfg_()
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 65), 0, 256)

    def fused_loss(p):
        logits = wn.forward_logits_fused(p, cfg, toks[:, :-1],
                                         interpret=True, tile=16)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return jnp.mean(-jnp.take_along_axis(
            logp, toks[:, 1:][..., None], -1)[..., 0])

    ref_loss, ref_g = jax.value_and_grad(
        lambda p: wn.loss_fn(p, cfg, toks)[0])(p)
    fused_l, fused_g = jax.value_and_grad(fused_loss)(p)
    np.testing.assert_allclose(float(fused_l), float(ref_loss), atol=2e-3,
                               rtol=1e-3)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(ref_g)[0],
            jax.tree_util.tree_flatten_with_path(fused_g)[0]):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b / scale, a / scale, atol=0.03,
                                   err_msg=str(ka))
