"""Mu-law companding codec (WaveNet paper arXiv:1609.03499 §2.2 eq.1).

    f(x) = sign(x) * ln(1 + mu*|x|) / ln(1 + mu),   mu = Q - 1

quantized to Q (default 256) integer classes. The reference (musyoku/wavenet)
implements this on NumPy; here it is pure jnp so it jits and fuses into the
input pipeline on device, with a NumPy mirror for host-side data prep.

Rounding convention (SURVEY.md §7.4 "Bit-matching mu-law"): the companded value
in [-1, 1] is mapped to bins by round-to-nearest over the affine map to
[0, Q-1]:  q = round((f(x) + 1) / 2 * (Q - 1)).  Decode returns bin centers:
y = 2*q/(Q-1) - 1 then the inverse expansion.  This is the paper-exact choice
documented while the reference mount is unreadable.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def encode(x, quantization_channels: int = 256):
    """Float waveform in [-1, 1] -> int32 class ids in [0, Q-1]."""
    mu = quantization_channels - 1
    x = jnp.clip(x, -1.0, 1.0)
    compressed = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(float(mu))
    q = jnp.round((compressed + 1.0) / 2.0 * mu)
    return q.astype(jnp.int32)


@functools.lru_cache(maxsize=8)
def _decode_table(quantization_channels: int) -> np.ndarray:
    """[Q] float32 bin centers, computed ONCE on the host: the compressed
    value in f32 (matching encode's affine map), the expansion in f64
    (np.log1p(mu) is a strong float64 scalar under NEP 50 — the historical
    decode_np path, which cpp/fastloader.cpp mirrors bit-exactly).  Every
    decoder — jnp, NumPy, C++ — reads THESE values, so decoded waveforms
    are bit-identical across host/device/native paths (a 1-ulp jnp-vs-np
    drift in expm1f broke exact serving replay tests in round 3)."""
    mu = quantization_channels - 1
    q = np.arange(quantization_channels, dtype=np.int32)
    compressed = 2.0 * q.astype(np.float32) / mu - 1.0
    x = (np.sign(compressed)
         * (np.expm1(np.abs(compressed) * np.log1p(mu)) / mu))
    return x.astype(np.float32)


def decode(q, quantization_channels: int = 256):
    """Int class ids in [0, Q-1] -> float32 waveform in [-1, 1].  A gather
    from the shared bin-center table — exact, and cheaper on device than
    re-deriving the expansion per sample."""
    return jnp.asarray(_decode_table(quantization_channels))[q]


# ---- NumPy mirrors (host-side data pipeline; bit-identical by table) ----

def encode_np(x: np.ndarray, quantization_channels: int = 256) -> np.ndarray:
    mu = quantization_channels - 1
    x = np.clip(x, -1.0, 1.0)
    compressed = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
    return np.round((compressed + 1.0) / 2.0 * mu).astype(np.int32)


def decode_np(q: np.ndarray, quantization_channels: int = 256) -> np.ndarray:
    return _decode_table(quantization_channels)[q]
