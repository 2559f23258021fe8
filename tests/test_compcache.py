"""Deployment knobs: persistent compilation cache + decode_unroll.

decode_unroll shortens the scan decoder's serialized layer chain (the
measured bound on wide configs — runs/evidence/full_decode/profile.json);
its contract is "same math per layer": trajectories must match unroll=1
on the backend under test.  The compilation cache is what makes the
~100 s cold compile of unrolled shapes a per-machine (not per-process)
cost; here we verify it actually persists executables to disk.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from wavenet_tpu.config import WaveNetConfig
from wavenet_tpu.models import wavenet as wn
from wavenet_tpu.models.api import WaveNet
from wavenet_tpu.utils import compcache


def _cfg(**kw):
    base = dict(num_blocks=2, max_dilation=8, residual_channels=16,
                skip_channels=16, compute_dtype="float32",
                batch_size=2, train_window=256)
    base.update(kw)
    return WaveNetConfig(**base)


@pytest.mark.parametrize("unroll", [2, 3, 8])
def test_decode_unroll_trajectory_identical(unroll, rng):
    """unroll=k (dividing and non-dividing L=8) samples the same tokens as
    unroll=1 from the same seed, primed and unprimed.  CPU-only by design:
    on TPU, XLA may reassociate across unrolled scan bodies, so near-tie
    trajectories can legitimately diverge between unroll settings — that is
    the documented contract (config.py decode_unroll; ARCHITECTURE.md §5),
    and tools/tpu_verify.py measures the hardware divergence instead."""
    if jax.default_backend() != "cpu":
        pytest.skip("bit-equality across unroll settings is only "
                    "contractual on CPU (see config.decode_unroll)")
    cfg = _cfg()
    params = wn.init_params(cfg, rng)
    key = jax.random.PRNGKey(3)
    prime = jax.random.randint(jax.random.PRNGKey(4), (2, 40), 0,
                               cfg.quantization_channels)
    for pt in (None, prime):
        base = wn.generate(params, cfg, key, 64, batch=2, prime_tokens=pt)
        fast = wn.generate(params, cfg.replace(decode_unroll=unroll), key,
                           64, batch=2, prime_tokens=pt)
        assert jnp.array_equal(base, fast), (
            f"unroll={unroll} diverged (prime={pt is not None})")


def test_decode_unroll_validated():
    with pytest.raises(ValueError, match="decode_unroll"):
        _cfg(decode_unroll=0)


def test_decode_unroll_json_roundtrip():
    cfg = _cfg(decode_unroll=8)
    assert WaveNetConfig.from_json(cfg.to_json()).decode_unroll == 8
    # older checkpoints' config JSON (no key) loads with the default
    import json
    d = json.loads(cfg.to_json())
    del d["decode_unroll"]
    assert WaveNetConfig.from_json(json.dumps(d)).decode_unroll == 1


def test_replace_config_guards_architecture(rng):
    cfg = _cfg()
    model = WaveNet(cfg, wn.init_params(cfg, rng))
    fast = model.replace_config(decode_unroll=8)
    assert fast.cfg.decode_unroll == 8
    assert fast.params is model.params          # shared, not copied
    assert model.cfg.decode_unroll == 1         # original untouched
    with pytest.raises(ValueError, match="architecture"):
        model.replace_config(residual_channels=32)


def test_compilation_cache_persists_to_disk(tmp_path, rng):
    d = str(tmp_path / "xla_cache")
    assert compcache.enable(d, min_compile_secs=0.0) == os.path.abspath(d)
    assert compcache.enabled_dir() == os.path.abspath(d)
    cfg = _cfg()
    params = wn.init_params(cfg, rng)
    wn.generate(params, cfg, jax.random.PRNGKey(0), 8, batch=2)
    entries = os.listdir(d)
    assert entries, "no executables persisted to the compilation cache"


def test_compile_cache_cli_flag(tmp_path):
    import argparse
    p = argparse.ArgumentParser()
    compcache.add_cli_flag(p)
    # absent -> disabled
    assert compcache.enable_from_args(p.parse_args([])) is None
    # bare flag -> default dir; with value -> that dir
    d = str(tmp_path / "cli_cache")
    got = compcache.enable_from_args(p.parse_args(["--compile-cache", d]))
    assert got == os.path.abspath(d) and os.path.isdir(d)
