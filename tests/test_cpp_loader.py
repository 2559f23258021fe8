"""Native C++ loader vs the NumPy reference path: bit-identical mu-law and
window gathering (SURVEY.md §4 kernel-vs-reference policy applied to the
host-side native component)."""

import numpy as np
import pytest

from wavenet_tpu.audio import mulaw
from wavenet_tpu.cpp import loader

pytestmark = pytest.mark.skipif(not loader.available(),
                                reason="C++ toolchain unavailable")


def test_mulaw_encode_bit_identical():
    x = np.random.RandomState(0).uniform(-1.2, 1.2, 100000).astype(np.float32)
    np.testing.assert_array_equal(loader.mulaw_encode(x), mulaw.encode_np(x))
    # edge cases incl. exact bin boundaries
    edges = np.array([-1.0, -0.5, 0.0, 1e-8, -1e-8, 0.5, 1.0], np.float32)
    np.testing.assert_array_equal(loader.mulaw_encode(edges),
                                  mulaw.encode_np(edges))


def test_mulaw_decode_bit_identical():
    q = np.arange(256, dtype=np.int32)
    np.testing.assert_array_equal(loader.mulaw_decode(q), mulaw.decode_np(q))


def test_mulaw_encode_independent_of_fp_rounding_mode():
    """The encode uses an explicit half-even round (advisor r1 #4): flipping
    the process FP rounding mode must not change a single bit."""
    import ctypes
    x = np.concatenate([
        np.random.RandomState(2).uniform(-1, 1, 50000).astype(np.float32),
        mulaw.decode_np(np.arange(256, dtype=np.int32)),   # near bin centers
    ])
    ref = mulaw.encode_np(x)
    libm = ctypes.CDLL("libm.so.6")
    FE_TONEAREST, FE_DOWNWARD, FE_UPWARD = 0x0, 0x400, 0x800
    try:
        for mode in (FE_DOWNWARD, FE_UPWARD, FE_TONEAREST):
            libm.fesetround(mode)
            np.testing.assert_array_equal(loader.mulaw_encode(x), ref)
    finally:
        libm.fesetround(FE_TONEAREST)


def test_round_trip_via_cpp():
    x = np.random.RandomState(1).uniform(-1, 1, 4096).astype(np.float32)
    q = loader.mulaw_encode(x)
    y = loader.mulaw_decode(q)
    assert np.max(np.abs(x - y)) < 0.025


@pytest.mark.parametrize("threads", [1, 4])
def test_gather_windows(threads):
    rng = np.random.RandomState(2)
    clips = [rng.randint(0, 256, rng.randint(500, 900)).astype(np.int32)
             for _ in range(5)]
    g = loader.WindowGatherer(clips)
    B, W = 16, 300
    idx = rng.randint(0, 5, B).astype(np.int32)
    starts = np.array([rng.randint(0, len(clips[i]) - W) for i in idx],
                      np.int64)
    out = g.gather(idx, starts, W, num_threads=threads)
    for b in range(B):
        np.testing.assert_array_equal(out[b],
                                      clips[idx[b]][starts[b]:starts[b] + W])


def test_dataset_native_path_matches_numpy():
    """AudioDataset batches must be identical with and without the C++
    gatherer (the NumPy loop is the reference implementation)."""
    from wavenet_tpu.audio.dataset import AudioDataset, IteratorState
    from wavenet_tpu.config import WaveNetConfig

    cfg = WaveNetConfig(num_blocks=1, max_dilation=8, residual_channels=8,
                        skip_channels=8, batch_size=4, train_window=256)
    ds = AudioDataset.synthetic(cfg, num_clips=3)
    assert ds._gatherer is not None
    st = IteratorState(seed=1, step=3)
    fast, _ = ds.sample_batch(st)
    ds._gatherer = None
    ref, _ = ds.sample_batch(st)
    np.testing.assert_array_equal(fast["tokens"], ref["tokens"])


def test_gather_bounds_checked():
    """The C++ gather does no bounds checks itself; the Python wrapper must
    reject out-of-range clip indices and windows that overrun their clip
    (a bad draw would otherwise silently return the NEXT clip's tokens)."""
    import pytest
    clips = [np.arange(100, dtype=np.int32), np.arange(50, dtype=np.int32)]
    g = loader.WindowGatherer(clips)
    with pytest.raises(IndexError):
        g.gather(np.array([2], np.int32), np.array([0], np.int64), 16)
    with pytest.raises(IndexError):
        g.gather(np.array([-1], np.int32), np.array([0], np.int64), 16)
    with pytest.raises(IndexError):
        g.gather(np.array([1], np.int32), np.array([40], np.int64), 16)
    with pytest.raises(IndexError):
        g.gather(np.array([0], np.int32), np.array([-1], np.int64), 16)
    # boundary-legal windows still pass
    out = g.gather(np.array([1, 0], np.int32), np.array([34, 84], np.int64),
                   16)
    np.testing.assert_array_equal(out[0], clips[1][34:50])
    np.testing.assert_array_equal(out[1], clips[0][84:100])
