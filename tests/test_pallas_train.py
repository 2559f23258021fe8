"""Fused training-stack kernel tests (SURVEY.md §4 "Kernel").

The kernel's numeric recipe is mixed precision: f32 residual carry and gate
math, bf16 MXU inputs (matching what XLA's excess-precision compilation
effectively does to the scan path ON TPU).  So the exact-equivalence oracle
is a pure-jnp implementation of THAT recipe (tight tolerances, autodiff'd
for gradient checks), and the scan path gets a looser sanity band (its CPU
execution carries a genuinely-bf16 residual stream)."""

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


def oracle_skip(params, cfg, x, y=None):
    """Pure-jnp mirror of the kernel's recipe: f32 carry, bf16 dot inputs."""
    L, R = cfg.num_layers, cfg.residual_channels
    bf = jnp.bfloat16
    x = x.astype(jnp.float32)
    skip = jnp.zeros(x.shape[:-1] + (cfg.skip_channels,), jnp.float32)
    dils = cfg.dilations
    for l in range(L):
        d = dils[l]
        xb = x.astype(bf)
        xp = jnp.pad(xb, ((0, 0), (d, 0), (0, 0)))[:, :-d or None][:, :x.shape[1]]
        wcur = params["w_cur"][l].reshape(R, 2 * R).astype(bf)
        wprev = params["w_prev"][l].reshape(R, 2 * R).astype(bf)
        z = (jnp.dot(xb, wcur, preferred_element_type=jnp.float32)
             + jnp.dot(xp, wprev, preferred_element_type=jnp.float32)
             + params["b"][l].reshape(2 * R).astype(jnp.float32))
        if y is not None:
            M = cfg.mel.num_mels
            z = z + jnp.dot(y.astype(bf),
                            params["v_cond"][l].reshape(M, 2 * R).astype(bf),
                            preferred_element_type=jnp.float32)
        h = (jnp.tanh(z[..., :R]) * jax.nn.sigmoid(z[..., R:])).astype(bf)
        skip = (skip + jnp.dot(h, params["w_skip"][l].astype(bf),
                               preferred_element_type=jnp.float32)
                + params["b_skip"][l].astype(jnp.float32))
        x = x + (jnp.dot(h, params["w_res"][l].astype(bf),
                         preferred_element_type=jnp.float32)
                 + params["b_res"][l].astype(jnp.float32))
    return skip


def embed(params, cfg, toks):
    prev = jnp.pad(toks[:, :-1], ((0, 0), (1, 0)))
    return wn.embed_tokens(params, cfg, toks, prev)


def test_supported_matrix():
    from wavenet_tpu.config import tiny, small, full, fastgen_bench
    assert ts.supported(tiny(), tiny().train_window)
    assert ts.supported(small(), small().train_window)
    assert ts.supported(fastgen_bench(), 8192)
    # the full preset runs as multiple layer groups
    assert ts.supported(full(), full().train_window)
    assert len(ts.group_plan(full(), 512)) > 1
    from wavenet_tpu.config import conditional
    c = conditional()
    assert ts.supported(c, c.train_window)      # cond runs fused too
    assert not ts.supported(cfg_(), 100)        # indivisible T


def test_small_dilation_config_supported_and_correct():
    """max_dilation < 8 configs must not crash the ring-store slice (advisor
    r1 #1): the window pad floors at 8 rows, and the fused grads still match
    the oracle."""
    cfg = cfg_(max_dilation=4, num_blocks=1)
    assert ts.supported(cfg, 64)
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, 256)
    tgt = jax.random.normal(jax.random.PRNGKey(2), (2, 64, cfg.skip_channels))

    def loss_with(stack_fn, p):
        x = embed(p, cfg, toks)
        return jnp.mean((stack_fn(p, x) - tgt) ** 2)

    ref_l, ref_g = jax.value_and_grad(
        lambda p: loss_with(lambda p, x: oracle_skip(p, cfg, x), p))(p)
    fus_l, fus_g = jax.value_and_grad(
        lambda p: loss_with(lambda p, x: ts.forward_skip_fused(
            p, cfg, x, interpret=True, tile=8), p))(p)
    np.testing.assert_allclose(float(fus_l), float(ref_l), rtol=2e-3)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(ref_g)[0],
            jax.tree_util.tree_flatten_with_path(fus_g)[0]):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b / scale, a / scale, atol=0.02,
                                   err_msg=str(ka))


def test_multi_group_grads_match_oracle(monkeypatch):
    """Shrink the VMEM budget so the tiny test model splits into several
    layer groups; gradients must still match the oracle."""
    cfg = cfg_()
    TT = 16
    # find a budget that forces >= 3 groups
    budget = max(max(ts._group_sizes(cfg, TT, cfg.dilations[l:l + 3])) for l in range(0, 6))
    monkeypatch.setattr(ts, "VMEM_BUDGET", budget)
    plan = ts.group_plan(cfg, TT)
    assert len(plan) >= 3, plan

    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, 256)
    tgt = jax.random.normal(jax.random.PRNGKey(2),
                            (2, 64, cfg.skip_channels))

    def loss_with(stack_fn, p):
        x = embed(p, cfg, toks)
        return jnp.mean((stack_fn(p, x) - tgt) ** 2)

    ref_l, ref_g = jax.value_and_grad(
        lambda p: loss_with(lambda p, x: oracle_skip(p, cfg, x), p))(p)
    fus_l, fus_g = jax.value_and_grad(
        lambda p: loss_with(lambda p, x: ts.forward_skip_fused(
            p, cfg, x, interpret=True, tile=TT), p))(p)
    np.testing.assert_allclose(float(fus_l), float(ref_l), rtol=2e-3)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(ref_g)[0],
            jax.tree_util.tree_flatten_with_path(fus_g)[0]):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b / scale, a / scale, atol=0.02,
                                   err_msg=str(ka))


@pytest.mark.parametrize("tile", [None, 8])
def test_forward_matches_oracle(tile):
    cfg = cfg_()
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (3, 64), 0, 256)
    x = embed(p, cfg, toks)
    ref = oracle_skip(p, cfg, x)
    got = ts.forward_skip_fused(p, cfg, x, interpret=True, tile=tile)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-3, rtol=1e-3)


@pytest.mark.parametrize("tile", [None, 16])
def test_grads_match_oracle(tile):
    cfg = cfg_()
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, 256)
    tgt = jax.random.normal(jax.random.PRNGKey(2),
                            (2, 64, cfg.skip_channels))

    def loss_with(stack_fn, p):
        x = embed(p, cfg, toks)
        skip = stack_fn(p, x)
        return jnp.mean((skip - tgt) ** 2)

    ref_l, ref_g = jax.value_and_grad(
        lambda p: loss_with(lambda p, x: oracle_skip(p, cfg, x), p))(p)
    fus_l, fus_g = jax.value_and_grad(
        lambda p: loss_with(lambda p, x: ts.forward_skip_fused(
            p, cfg, x, interpret=True, tile=tile), p))(p)

    np.testing.assert_allclose(float(fus_l), float(ref_l), rtol=2e-3)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(ref_g)[0],
            jax.tree_util.tree_flatten_with_path(fus_g)[0]):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b / scale, a / scale, atol=0.02,
                                   err_msg=str(ka))


@pytest.mark.parametrize("nb", [(2, 2), (4, 2), (2, 4), (4, 4)])
def test_multirow_matches_oracle(nb):
    """Multi-row grid steps (nb batch rows flattened into each matmul's M
    dim) are mathematically identical to single-row: forward and grads must
    match the oracle exactly as tightly as nb=(1,1) does."""
    cfg = cfg_()
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (4, 64), 0, 256)
    tgt = jax.random.normal(jax.random.PRNGKey(2), (4, 64, cfg.skip_channels))

    def loss_with(stack_fn, p):
        x = embed(p, cfg, toks)
        return jnp.mean((stack_fn(p, x) - tgt) ** 2)

    ref_l, ref_g = jax.value_and_grad(
        lambda p: loss_with(lambda p, x: oracle_skip(p, cfg, x), p))(p)
    fus_l, fus_g = jax.value_and_grad(
        lambda p: loss_with(lambda p, x: ts.forward_skip_fused(
            p, cfg, x, interpret=True, tile=16, nb=nb), p))(p)
    np.testing.assert_allclose(float(fus_l), float(ref_l), rtol=2e-3)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(ref_g)[0],
            jax.tree_util.tree_flatten_with_path(fus_g)[0]):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b / scale, a / scale, atol=0.02,
                                   err_msg=str(ka))


def test_multirow_bitwise_equals_single_row():
    """Same kernel recipe, rows independent in the matmul -> the multi-row
    forward must be BIT-identical to single-row (both interpret mode)."""
    cfg = cfg_()
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (4, 64), 0, 256)
    x = embed(p, cfg, toks)
    a = ts.forward_skip_fused(p, cfg, x, interpret=True, tile=16, nb=(1, 1))
    b = ts.forward_skip_fused(p, cfg, x, interpret=True, tile=16, nb=(4, 1))
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_multirow_conditional_and_global():
    """Mel + speaker conditioning through the multi-row kernels: loss and
    grads finite and equal to the single-row fused loss."""
    from wavenet_tpu.config import MelConfig
    mel_cfg = MelConfig(num_mels=8, hop_length=16, win_length=64,
                        fmax=4000.0, upsample_factors=(4, 4))
    cfg = cfg_(mel=mel_cfg, global_classes=3, global_channels=8)
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (4, 65), 0, 256)
    mel = jax.random.normal(jax.random.PRNGKey(2), (4, 5, 8))
    spk = jnp.asarray([0, 1, 2, 1], jnp.int32)

    def fused_loss(p, nb):
        inputs, targets = toks[:, :-1], toks[:, 1:]
        prev = jnp.pad(inputs[:, :-1], ((0, 0), (1, 0)))
        x = wn.embed_tokens(p, cfg, inputs, prev)
        from wavenet_tpu.models.conditioning import upsample_mel
        y = upsample_mel(p["upsampler"], cfg.mel, mel, 64)
        g = wn.global_cond_offsets(p, cfg, spk)
        skip = ts.forward_skip_fused(p, cfg, x, interpret=True, tile=16,
                                     y=y, g=g, nb=nb)
        logits = wn.head_logits(p, cfg, skip)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return jnp.mean(-jnp.take_along_axis(
            logp, targets[..., None], -1)[..., 0])

    l1, g1 = jax.value_and_grad(lambda p: fused_loss(p, (1, 1)))(p)
    l2, g2 = jax.value_and_grad(lambda p: fused_loss(p, (2, 4)))(p)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(g1)[0],
            jax.tree_util.tree_flatten_with_path(g2)[0]):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-5,
                                   err_msg=str(ka))


def test_pick_nb_planner():
    from wavenet_tpu.config import small, full
    c = small()
    nb = ts.pick_nb(c, c.train_window, c.batch_size)
    assert c.batch_size % nb[0] == 0 and c.batch_size % nb[1] == 0
    TT = ts.pick_tile(c, c.train_window)
    assert ts.group_plan(c, TT, nb)          # feasible plan exists
    # non-power-of-two batches fall back to single-row
    assert ts.pick_nb(c, c.train_window, 3) == (1, 1)
    # untileable T falls back
    assert ts.pick_nb(c, 100, 8) == (1, 1)
    # full preset must not explode its group count for a marginal nb win
    f = full()
    nbf = ts.pick_nb(f, f.train_window, f.batch_size)
    TTf = ts.pick_tile(f, f.train_window)
    assert len(ts.group_plan(f, TTf, nbf)) <= 8


def test_pick_nb_env_override(monkeypatch):
    """WAVENET_TPU_NB forces the layout (bench.py's compile-failure escape
    hatch); an infeasible forced pair still auto-downgrades to (1, 1) in
    forward_skip_fused's auto_nb path."""
    from wavenet_tpu.config import small
    c = small()
    monkeypatch.setenv("WAVENET_TPU_NB", "1,1")
    assert ts.pick_nb(c, c.train_window, c.batch_size) == (1, 1)
    monkeypatch.setenv("WAVENET_TPU_NB", "2,1")
    assert ts.pick_nb(c, c.train_window, c.batch_size) == (2, 1)


def test_nb_hw_bound_refused():
    """nb rows beyond NB_HW_MAX miscompile on v5e (hw-vs-interpret
    divergence, tools/tpu_verify.py 2026-08-18): the planner must refuse
    them for HARDWARE — no plan, no sweep candidate — while interpret mode
    (bit-exact at any nb) stays unfenced so the variant remains testable
    and a future-chip recalibration observable (round-2 advisor)."""
    from wavenet_tpu.config import small
    c = small()
    TT = ts.pick_tile(c, c.train_window)
    bad = ts.NB_HW_MAX * 2
    assert ts.plan_dils(c, c.dilations, TT, (bad, 1)) == []
    assert ts.plan_dils(c, c.dilations, TT, (1, bad)) == []
    assert all(max(nb) <= ts.NB_HW_MAX
               for nb, _ in ts.nb_candidates(c, c.dilations, TT, 16))
    # interpret mode plans beyond the bound and stays bit-identical to the
    # hardware-proven single-row layout (tiny config: the fuzz-suite shape)
    cc = cfg_(num_blocks=1, max_dilation=4, residual_channels=8,
              skip_channels=8)
    assert ts.plan_dils(cc, cc.dilations, ts.pick_tile(cc, 64), (bad, 1),
                        hw=False)
    pp = wn.init_params(cc, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (8, 64), 0, 256)
    xx = embed(pp, cc, toks)
    ref = ts.forward_skip_fused(pp, cc, xx, interpret=True, nb=(1, 1))
    got = ts.forward_skip_fused(pp, cc, xx, interpret=True, nb=(bad, 1))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_mel_multirow_hw_fenced():
    """Mel + multi-row miscompiles on v5e whenever the grid has more than
    one batch block (Mosaic bug #5, 2026-08-19): hardware plans must refuse
    nb > 1 whenever cfg.mel is set, while interpret plans stay available
    (the math is bit-exact there: test_multirow_conditional_and_global)."""
    from wavenet_tpu.config import MelConfig, small
    c = small().replace(mel=MelConfig())
    TT = ts.pick_tile(c, c.train_window)
    assert ts.plan_dils(c, c.dilations, TT, (2, 1)) == []
    assert ts.plan_dils(c, c.dilations, TT, (1, 2)) == []
    assert ts.plan_dils(c, c.dilations, TT, (1, 1))
    assert ts.plan_dils(c, c.dilations, TT, (2, 1), hw=False)
    assert all(nb == (1, 1)
               for nb, _ in ts.nb_candidates(c, c.dilations, TT, 8))


def test_planner_fuzz():
    """Planner invariants over a random config sweep (the round-1 advisor
    crash was a planner edge: max_dilation < 8 produced a negative ring
    slice).  For every config and tileable T:
      - a (1, 1) plan exists whenever supported() says so;
      - pick_nb returns a pair whose plan is feasible and divides B;
      - _group_sizes grows monotonically in each nb component (the VMEM
        model may never say a BIGGER step is cheaper, or plan_dils would
        build infeasible groups)."""
    rng = np.random.RandomState(7)
    for _ in range(40):
        cfg = cfg_(num_blocks=int(rng.randint(1, 4)),
                   max_dilation=int(2 ** rng.randint(0, 7)),
                   residual_channels=int(rng.choice([8, 16, 32, 64])),
                   skip_channels=int(rng.choice([8, 16, 32, 64])))
        T = int(rng.choice([64, 128, 512, 1024]))
        B = int(rng.choice([1, 2, 3, 4, 8]))
        TT = ts.pick_tile(cfg, T)
        if not ts.supported(cfg, T):
            continue
        assert ts.group_plan(cfg, TT, (1, 1)), (cfg.dilations, TT)
        nb = ts.pick_nb(cfg, T, B)
        assert B % nb[0] == 0 and B % nb[1] == 0, (nb, B)
        assert ts.group_plan(cfg, TT, nb), (cfg.dilations, TT, nb)
        dils = cfg.dilations[:max(1, len(cfg.dilations) // 2)]
        f1, b1 = ts._group_sizes(cfg, TT, dils, (1, 1))
        f2, b2 = ts._group_sizes(cfg, TT, dils, (2, 2))
        f4, b4 = ts._group_sizes(cfg, TT, dils, (4, 4))
        assert f1 <= f2 <= f4 and b1 <= b2 <= b4


def test_logits_sane_vs_scan():
    """Loose band vs the scan path: same model, slightly different precision
    recipe — logits must agree to bf16-chaos levels and the loss closely."""
    cfg = cfg_()
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 65), 0, 256)
    ref = wn.loss_fn(p, cfg, toks)[0]
    got = wn.loss_fn(p, cfg, toks, use_fused=True, interpret=True)[0]
    np.testing.assert_allclose(float(got), float(ref), atol=5e-3, rtol=2e-3)


def test_conditional_fused_matches_oracle():
    """Conditional fused path (y @ v_cond in-kernel): tight gradient match
    against the recipe oracle with conditioning (incl. v_cond and y/upsampler
    cotangents), plus scan-path loss closeness."""
    from wavenet_tpu.config import MelConfig
    from wavenet_tpu.models.conditioning import upsample_mel
    from wavenet_tpu.ops.pallas.train_stack import forward_skip_fused
    mel_cfg = MelConfig(num_mels=8, hop_length=16, win_length=64,
                        fmax=4000.0, upsample_factors=(4, 4))
    cfg = cfg_(mel=mel_cfg)
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 65), 0, 256)
    mel = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 8))
    tgt = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 16))

    def loss_with(stack_fn, p):
        x = embed(p, cfg, toks[:, :64])
        y = upsample_mel(p["upsampler"], cfg.mel, mel, 64)
        return jnp.mean((stack_fn(p, x, y) - tgt) ** 2)

    ref_l, ref_g = jax.value_and_grad(lambda p: loss_with(
        lambda p, x, y: oracle_skip(p, cfg, x, y=y), p))(p)
    fus_l, fus_g = jax.value_and_grad(lambda p: loss_with(
        lambda p, x, y: forward_skip_fused(p, cfg, x, interpret=True, y=y),
        p))(p)
    np.testing.assert_allclose(float(fus_l), float(ref_l), rtol=2e-3)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(ref_g)[0],
            jax.tree_util.tree_flatten_with_path(fus_g)[0]):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b / scale, a / scale, atol=0.02,
                                   err_msg=str(ka))

    # scan-path sanity: losses close (65-token window -> T=64 inputs)
    ref2 = wn.loss_fn(p, cfg, toks, mel=mel)[0]
    got2 = wn.loss_fn(p, cfg, toks, mel=mel, use_fused=True,
                      interpret=True)[0]
    np.testing.assert_allclose(float(got2), float(ref2), atol=5e-3,
                               rtol=2e-3)


def test_conditional_fused_multi_group(monkeypatch):
    from wavenet_tpu.config import MelConfig
    mel_cfg = MelConfig(num_mels=8, hop_length=16, win_length=64,
                        fmax=4000.0, upsample_factors=(4, 4))
    cfg = cfg_(mel=mel_cfg)
    TT = 16
    budget = max(max(ts._group_sizes(cfg, TT, cfg.dilations[l:l + 3])) for l in range(0, 6))
    monkeypatch.setattr(ts, "VMEM_BUDGET", budget)
    assert len(ts.group_plan(cfg, TT)) >= 3
    p = wn.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 65), 0, 256)
    mel = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8))
    ref_l = wn.loss_fn(p, cfg, toks, mel=mel)[0]

    def fused_loss(p):
        logits = wn.forward_logits_fused(p, cfg, toks[:, :-1],
                                         interpret=True, tile=TT, mel=mel)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return jnp.mean(-jnp.take_along_axis(
            logp, toks[:, 1:][..., None], -1)[..., 0])

    fus_l, fus_g = jax.value_and_grad(fused_loss)(p)
    np.testing.assert_allclose(float(fus_l), float(ref_l), atol=5e-3,
                               rtol=2e-3)
    assert all(np.isfinite(np.asarray(x, np.float32)).all()
               for x in jax.tree.leaves(fus_g))


def test_round_bf16_branches_equivalent():
    """_round_bf16's two implementations — reduce_precision(v, 8, 7) in
    interpret mode vs the astype(bf16).astype(f32) pair on hardware — must
    round identically, or hw and interpret silently diverge again (the exact
    bug the helper fixes; ADVICE r3).  Both are round-to-nearest-even at
    bf16's (8-bit exp, 7-bit mantissa); sweep the cases where RNE
    implementations differ: ties (mantissa exactly halfway), denormals,
    overflow-to-inf, NaN, and a dense random sweep."""
    ties = []
    for exp in (-3, 0, 10, 120):
        base = 2.0 ** exp
        ulp = base * 2.0 ** -7                     # bf16 ulp at this binade
        for m in (0, 1, 2, 3, 127):
            ties += [base + m * ulp + 0.5 * ulp,   # exact tie
                     base + m * ulp + 0.25 * ulp,  # below tie
                     base + m * ulp + 0.75 * ulp]  # above tie
    special = [0.0, -0.0, np.inf, -np.inf, np.nan,
               1e-45, -1e-45, 1e-40, 2.0 ** -133, 2.0 ** -126,  # denormals
               3.4e38, -3.4e38, 65520.0]           # near-overflow
    rng = np.random.default_rng(0)
    dense = rng.standard_normal(4096).astype(np.float32) * rng.choice(
        [1e-6, 1.0, 1e6], size=4096).astype(np.float32)
    v = jnp.asarray(np.concatenate([np.asarray(ties, np.float32),
                                    np.asarray(special, np.float32),
                                    np.asarray([-t for t in ties],
                                               np.float32),
                                    dense]))
    a = jax.lax.reduce_precision(v, 8, 7)
    b = v.astype(jnp.bfloat16).astype(jnp.float32)
    na, nb = np.asarray(a), np.asarray(b)
    both_nan = np.isnan(na) & np.isnan(nb)
    assert np.array_equal(na[~both_nan], nb[~both_nan]), (
        np.flatnonzero(~(na == nb) & ~both_nan)[:10])
    assert both_nan.any()                          # NaN case was exercised
