"""Mu-law codec tests (SURVEY.md §4 "Unit": round-trip and bin-edge exactness)."""

import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_tpu.audio import mulaw


def test_round_trip_error_bound():
    # decode(encode(x)) must be within one companded bin of x
    x = np.linspace(-1, 1, 4097, dtype=np.float32)
    q = mulaw.encode_np(x)
    y = mulaw.decode_np(q)
    # error bound: companded-domain quantization step is 2/255; expansion is
    # monotone so max waveform error is bounded by the largest bin width
    assert np.max(np.abs(x - y)) < 0.025
    # near zero the bins are tiny
    small = np.abs(x) < 0.01
    assert np.max(np.abs(x[small] - y[small])) < 1e-3


def test_extremes_and_zero():
    q = mulaw.encode_np(np.array([-1.0, 0.0, 1.0], np.float32))
    np.testing.assert_array_equal(q, [0, 128, 255])  # f(0)=0 -> 127.5 -> banker's round to 128
    y = mulaw.decode_np(np.array([0, 255], np.int32))
    np.testing.assert_allclose(y, [-1.0, 1.0], atol=1e-6)


def test_zero_maps_to_midpoint():
    # f(0)=0 -> bin round(127.5); np.round uses banker's rounding -> 128
    q = int(mulaw.encode_np(np.array([0.0], np.float32))[0])
    assert q in (127, 128)
    # 0 sits exactly between bins 127/128, so the decoded center is half a
    # (near-zero) bin away: |decode(q)| <= (1/255)*ln-expansion ~ 8.7e-5
    assert abs(float(mulaw.decode_np(np.array([q], np.int32))[0])) < 1e-4


def test_monotone():
    x = np.linspace(-1, 1, 10001, dtype=np.float32)
    q = mulaw.encode_np(x)
    assert np.all(np.diff(q) >= 0)
    centers = mulaw.decode_np(np.arange(256, dtype=np.int32))
    assert np.all(np.diff(centers) > 0)


def test_jnp_matches_np():
    x = np.random.RandomState(0).uniform(-1, 1, 4096).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(mulaw.encode(x)), mulaw.encode_np(x))
    q = np.random.RandomState(1).randint(0, 256, 1024).astype(np.int32)
    np.testing.assert_allclose(np.asarray(mulaw.decode(q)), mulaw.decode_np(q),
                               atol=1e-6)


def test_clip_out_of_range():
    q = mulaw.encode_np(np.array([-5.0, 5.0], np.float32))
    np.testing.assert_array_equal(q, [0, 255])


@pytest.mark.parametrize("Q", [64, 128, 256, 512])
def test_other_quantizations(Q):
    x = np.linspace(-1, 1, 1001, dtype=np.float32)
    q = mulaw.encode_np(x, Q)
    assert q.min() == 0 and q.max() == Q - 1
    y = mulaw.decode_np(q, Q)
    assert np.max(np.abs(x - y)) < 8.0 / Q
