"""Wide-R (channels-on-lanes) whole-loop decode kernel vs the XLA scan.

The contract is the transposed kernel's, on the configs that kernel cannot
serve (R >= 128): token trajectories BIT-IDENTICAL to models.wavenet.generate
in greedy, counter-RNG-sampled, primed, chunked, tiled, and
globally-conditioned modes.  All tests run the kernel in interpret mode on
CPU (conftest forces the cpu backend); hardware bit-exactness is gated by
tools/tpu_verify.py's wide-decode checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_tpu.config import WaveNetConfig, conditional, fastgen_bench, full
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.ops import rng
from wavenet_tpu.ops.pallas import decode_wide as pwide


def cfg_(**kw):
    base = dict(num_blocks=1, max_dilation=8, residual_channels=128,
                skip_channels=128, compute_dtype="bfloat16")
    base.update(kw)
    return WaveNetConfig(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = cfg_()
    params = wn.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_supported_and_plans():
    # the flagship preset is the kernel's raison d'etre
    assert pwide.supported(full())
    bt, tc = pwide.plan_tiles(full(), 8)
    assert bt == 8 and tc >= 8
    assert pwide.fits_vmem(full(), 8)
    assert pwide.fits_vmem(full(), 16)
    # narrow-R models belong to the transposed kernel, mel to the scan
    assert not pwide.supported(fastgen_bench())
    assert not pwide.supported(conditional())
    assert pwide.plan_tiles(fastgen_bench(), 8) == (0, 0)
    # every plan honestly fits the budget
    for b in (1, 8, 16, 32):
        bt, tc = pwide.plan_tiles(full(), b)
        if bt:
            assert pwide._tile_bytes(full(), bt, tc) <= pwide.WIDE_VMEM_BUDGET


def test_greedy_long_matches_scan(setup):
    """512 greedy steps bit-equal to the scan — LONG on purpose: the
    round-1..3 bf16 embed tables diverged from embed_tokens by one ulp on
    ~37% of (token, prev) pairs, which flips greedy argmax at near-ties
    within ~50 steps; the f32-selection embed fix is what this guards."""
    cfg, params = setup
    key = jax.random.PRNGKey(1)
    B, N = 4, 512
    tk = pwide.generate_wide(params, cfg, key, N, batch=B, temperature=0.0,
                             interpret=True)
    ts = wn.generate(params, cfg, key, N, batch=B, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(tk), np.asarray(ts))


def test_sampled_matches_scan_counter_rng(setup):
    cfg, params = setup
    key = jax.random.PRNGKey(1)
    B, N = 4, 256
    seeds = rng.derive_row_seeds(jnp.int32(7), B)
    tk = pwide.generate_wide(params, cfg, key, N, batch=B, temperature=1.0,
                             interpret=True, seeds=seeds)
    ts = wn.generate(params, cfg, key, N, batch=B, temperature=1.0,
                     seeds=seeds)
    t = np.asarray(tk)
    np.testing.assert_array_equal(t, np.asarray(ts))
    assert len(np.unique(t)) > 8                 # actually sampling


def test_primed_matches_scan(setup):
    cfg, params = setup
    key = jax.random.PRNGKey(1)
    B, P, N = 2, 13, 96
    prime = jax.random.randint(jax.random.PRNGKey(3), (B, P), 0, 256)
    tk = pwide.generate_wide(params, cfg, key, N, batch=B, temperature=0.0,
                             prime_tokens=prime, interpret=True)
    ts = wn.generate(params, cfg, key, N, batch=B, temperature=0.0,
                     prime_tokens=prime)
    np.testing.assert_array_equal(np.asarray(tk), np.asarray(ts))


def test_chunked_continuation_bit_identical(setup):
    """Two decode_chunk calls with carried rings+tokens == one launch (the
    streaming contract: the counter RNG keys by GLOBAL step)."""
    cfg, params = setup
    B, N = 2, 128
    seeds = rng.derive_row_seeds(jnp.int32(11), B)
    rings, carry, s, g, P, total = pwide.setup_decode(
        params, cfg, jax.random.PRNGKey(0), B, N, seeds=seeds)
    one, _, _ = pwide.decode_chunk(params, cfg, rings, carry, jnp.int32(0),
                                   s, N, 1.0, interpret=True,
                                   force_tiles=(B, 64))
    rings2, carry2, s2, _, _, _ = pwide.setup_decode(
        params, cfg, jax.random.PRNGKey(0), B, N, seeds=seeds)
    a, rings2, carry2 = pwide.decode_chunk(params, cfg, rings2, carry2,
                                           jnp.int32(0), s2, 64, 1.0,
                                           interpret=True,
                                           force_tiles=(B, 32))
    b, _, _ = pwide.decode_chunk(params, cfg, rings2, carry2, jnp.int32(64),
                                 s2, 64, 1.0, interpret=True,
                                 force_tiles=(B, 32))
    np.testing.assert_array_equal(
        np.asarray(one), np.asarray(jnp.concatenate([a, b], axis=1)))


def test_batch_tiles_match_untiled(setup):
    cfg, params = setup
    key = jax.random.PRNGKey(2)
    B, N = 4, 64
    seeds = rng.derive_row_seeds(jnp.int32(5), B)
    whole = pwide.generate_wide(params, cfg, key, N, batch=B,
                                temperature=1.0, interpret=True, seeds=seeds,
                                force_tiles=(4, 32))
    tiled = pwide.generate_wide(params, cfg, key, N, batch=B,
                                temperature=1.0, interpret=True, seeds=seeds,
                                force_tiles=(2, 32))
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(tiled))


def test_global_conditioning_matches_scan():
    cfg = cfg_(global_classes=4)
    params = wn.init_params(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    B, N = 4, 96
    speaker = jnp.asarray([0, 1, 2, 3], jnp.int32)
    seeds = rng.derive_row_seeds(jnp.int32(9), B)
    tk = pwide.generate_wide(params, cfg, key, N, batch=B, temperature=1.0,
                             speaker=speaker, interpret=True, seeds=seeds)
    ts = wn.generate(params, cfg, key, N, batch=B, temperature=1.0,
                     speaker=speaker, seeds=seeds)
    np.testing.assert_array_equal(np.asarray(tk), np.asarray(ts))
    # speakers actually condition: rows must differ
    t = np.asarray(tk)
    assert not np.array_equal(t[0], t[1])


def test_stream_wide_matches_one_shot(setup, monkeypatch):
    """generate_stream routes wide-R configs through the wide kernel and
    the concatenated chunks equal the one-shot decode (carried rings +
    global-step RNG keying)."""
    from wavenet_tpu.generate.sampler import generate_stream
    from wavenet_tpu.ops.pallas import decode as pdec
    cfg, params = setup
    # this small test config happens to fit the transposed kernel too;
    # force the wide streaming branch (the `full`-preset situation)
    monkeypatch.setattr(pdec, "fits_vmem", lambda *a, **k: False)
    key = jax.random.PRNGKey(4)
    B, N = 2, 200
    seeds = rng.derive_row_seeds(jnp.int32(3), B)
    one = pwide.generate_wide(params, cfg, key, N, batch=B,
                              temperature=1.0, interpret=True, seeds=seeds)
    chunks = list(generate_stream(params, cfg, key, N, chunk_samples=48,
                                  batch=B, temperature=1.0, interpret=True,
                                  seeds=seeds))
    got = np.concatenate([np.asarray(c) for c in chunks], axis=1)
    assert got.shape == (B, N)
    np.testing.assert_array_equal(got, np.asarray(one))


def test_generate_auto_routes_wide(setup, monkeypatch):
    """On a TPU backend, generate_auto sends wide-R configs that the
    transposed kernel refuses (the `full` preset case) to the wide kernel,
    not the scan."""
    import wavenet_tpu.generate.sampler as sampler
    from wavenet_tpu.ops.pallas import decode as pdec
    cfg, params = setup
    monkeypatch.setattr(sampler, "_tpu_backend", lambda: True)
    # make this small test config look like `full`: transposed kernel out
    monkeypatch.setattr(pdec, "fits_vmem", lambda *a, **k: False)
    called = {}

    def fake_wide(p, c, key, n, **kw):
        called["wide"] = True
        return jnp.zeros((kw.get("batch", 1), n), jnp.int32)

    monkeypatch.setattr(pwide, "generate_wide", fake_wide)
    out = sampler.generate_auto(params, cfg, jax.random.PRNGKey(0), 16,
                                batch=2)
    assert called.get("wide") and out.shape == (2, 16)


def test_wide_dp_fanout_matches_single_chip():
    """generate_pallas_dp routes wide-R configs through the wide kernel per
    data shard; tokens equal the single-chip wide kernel over the full
    batch (per-row counter RNG keyed by GLOBAL row index), one-shot AND
    streamed."""
    from jax.sharding import Mesh
    from wavenet_tpu.parallel import distdecode
    cfg = cfg_(global_classes=4)
    params = wn.init_params(cfg, jax.random.PRNGKey(0))
    devs = jax.devices()[:4]
    mesh = Mesh(np.asarray(devs).reshape(4, 1),
                (distdecode.DATA_AXIS, distdecode.MODEL_AXIS))
    B, N = 8, 64
    speaker = jnp.arange(B, dtype=jnp.int32) % 4
    # make the per-shard batch look like the `full` case (transposed kernel
    # refuses) without monkeypatching shard_map internals: the real full()
    # preset is too slow for CPU interpret, so rely on plan order instead —
    # the dp router must pick wide whenever pdec refuses
    from wavenet_tpu.ops.pallas import decode as pdec
    orig = pdec.fits_vmem
    pdec.fits_vmem = lambda *a, **k: False
    try:
        dp_toks = distdecode.generate_pallas_dp(
            params, cfg, mesh, seed=3, num_samples=N, batch=B,
            speaker=speaker, interpret=True)
        chunks = list(distdecode.generate_pallas_dp_stream(
            params, cfg, mesh, seed=3, num_samples=N, batch=B,
            chunk_samples=32, speaker=speaker, interpret=True))
    finally:
        pdec.fits_vmem = orig
    one = pwide.generate_wide(params, cfg, None, N, batch=B,
                              speaker=speaker, interpret=True,
                              seeds=rng.as_row_seeds(3, B))
    np.testing.assert_array_equal(np.asarray(dp_toks), np.asarray(one))
    got = np.concatenate([np.asarray(c) for c in chunks], axis=1)
    np.testing.assert_array_equal(got, np.asarray(one))
