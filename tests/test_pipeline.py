"""Fused-stack pipeline parallelism (parallel/pipeline.py): the layer-group
kernels under model sharding.  Pipeline loss/grads must match the
single-device fused loss (same kernels, same group boundaries when the
single-device plan aligns to stages) and the pure-jnp oracle within the
usual kernel tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_tpu.config import MelConfig, WaveNetConfig
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.parallel import pipeline as pp
from wavenet_tpu.parallel.mesh import make_mesh


def cfg_(**kw):
    base = dict(num_blocks=4, max_dilation=8, residual_channels=16,
                skip_channels=16, compute_dtype="bfloat16",
                batch_size=4, train_window=64)
    base.update(kw)
    return WaveNetConfig(**base)


def ref_loss_fused(p, cfg, toks, mel=None, tile=None):
    return wn.loss_fn(p, cfg, toks, mel=mel, use_fused=True,
                      interpret=True)[0]


def align_group_budget(monkeypatch, cfg, mp, T):
    """Pin VMEM_BUDGET so the single-device group plan splits exactly at
    pipeline-stage boundaries: the recipe rounds the residual stream to
    bf16 at GROUP edges, so matching boundaries makes single-device and
    pipeline numerics identical (not just close)."""
    from wavenet_tpu.ops.pallas import train_stack as ts
    TT = ts.pick_tile(cfg, T)
    Lst = cfg.num_layers // mp
    budget = max(max(ts._group_sizes(cfg, TT, cfg.dilations[i:i + Lst]))
                 for i in range(0, cfg.num_layers - Lst + 1))
    monkeypatch.setattr(ts, "VMEM_BUDGET", budget)
    plan = ts.group_plan(cfg, TT)
    assert all(hi - lo <= Lst for lo, hi in plan), plan


def test_supported():
    assert pp.supported(cfg_(), 64, 2)
    assert pp.supported(cfg_(), 64, 4)
    assert not pp.supported(cfg_(), 64, 3)      # 4 blocks % 3 != 0
    assert not pp.supported(cfg_(), 100, 2)     # indivisible T
    assert len(pp.stage_dilations(cfg_(), 4)) == 4


@pytest.mark.parametrize("mp,dp,mb", [(2, 1, 1), (4, 1, 2), (2, 2, 1),
                                      (4, 2, 1)])
def test_pipeline_loss_and_grads_match_fused(mp, dp, mb, monkeypatch):
    cfg = cfg_(model_parallel=mp, data_parallel=dp)
    align_group_budget(monkeypatch, cfg, mp, 64)
    mesh = make_mesh(cfg)
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (4, 65), 0, 256)

    ref_l, ref_g = jax.value_and_grad(
        lambda p: ref_loss_fused(p, cfg, toks))(p)
    pp_l, pp_g = jax.jit(jax.value_and_grad(
        lambda p: pp.loss_fn_pp(p, cfg, mesh, toks, microbatch=mb,
                                interpret=True)[0]))(p)
    np.testing.assert_allclose(float(pp_l), float(ref_l), rtol=2e-4,
                               atol=2e-4)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(ref_g)[0],
            jax.tree_util.tree_flatten_with_path(pp_g)[0]):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b / scale, a / scale, atol=0.02,
                                   err_msg=str(ka))


def test_pipeline_conditional_matches_fused(monkeypatch):
    mel_cfg = MelConfig(num_mels=8, hop_length=16, win_length=64,
                        fmax=4000.0, upsample_factors=(4, 4))
    cfg = cfg_(mel=mel_cfg, model_parallel=2, data_parallel=2)
    align_group_budget(monkeypatch, cfg, 2, 64)
    mesh = make_mesh(cfg)
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (4, 65), 0, 256)
    mel = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 8))

    ref_l, ref_g = jax.value_and_grad(
        lambda p: ref_loss_fused(p, cfg, toks, mel=mel))(p)
    pp_l, pp_g = jax.jit(jax.value_and_grad(
        lambda p: pp.loss_fn_pp(p, cfg, mesh, toks, mel=mel,
                                interpret=True)[0]))(p)
    np.testing.assert_allclose(float(pp_l), float(ref_l), rtol=2e-4,
                               atol=2e-4)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(ref_g)[0],
            jax.tree_util.tree_flatten_with_path(pp_g)[0]):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b / scale, a / scale, atol=0.02,
                                   err_msg=str(ka))


def test_pipeline_multirow_matches_single_row(monkeypatch):
    """Multi-row grid steps inside the pipeline stages: force
    pick_nb_dils to (2, 2) and require bit-level agreement of the LOSS with
    the nb=(1,1) pipeline (rows are independent in the flattened matmuls).
    Weight grads reduce over the flattened [NB*TT] rows in one jnp.sum
    instead of one per-row sum per grid step — a different f32 summation
    order — so they get a last-ulps band instead of bit equality."""
    from wavenet_tpu.ops.pallas import train_stack as ts
    cfg = cfg_(model_parallel=2, batch_size=4)
    mesh = make_mesh(cfg)
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (4, 65), 0, 256)

    def run():
        return jax.jit(jax.value_and_grad(
            lambda p: pp.loss_fn_pp(p, cfg, mesh, toks, microbatch=4,
                                    interpret=True)[0]))(p)

    # pin BOTH sides: the auto-pick would choose nb=(4,4) here, so without
    # pinning the "single-row baseline" would itself be multi-row
    monkeypatch.setattr(ts, "pick_nb_dils", lambda *a, **k: (1, 1))
    l1, g1 = run()
    monkeypatch.setattr(ts, "pick_nb_dils", lambda *a, **k: (2, 2))
    l2, g2 = run()
    assert np.float32(l1) == np.float32(l2)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(g1)[0],
            jax.tree_util.tree_flatten_with_path(g2)[0]):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-6,
                                   err_msg=str(ka))


def test_layer_sharded_params_place():
    """param_pspecs_layer places stacked leaves split on L over `model`."""
    from jax.sharding import NamedSharding
    from wavenet_tpu.parallel import sharding as shd
    cfg = cfg_(model_parallel=4)
    mesh = make_mesh(cfg)
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    sh = shd.param_shardings(cfg, mesh, layer_sharded=True)
    ps = jax.device_put(p, sh)
    assert ps["w_cur"].sharding.spec[0] == "model"
    assert ps["head_w2"].sharding.spec == jax.sharding.PartitionSpec(
        None, None)
