"""Streaming dataset (audio/streaming.py): bit-identical to the in-memory
AudioDataset on the same corpus — same (seed, step) determinism, exact
resume, bounded cache, background prefetch, per-host row slicing."""

import numpy as np
import pytest

from wavenet_tpu.audio.dataset import AudioDataset, IteratorState
from wavenet_tpu.audio.io import write_wav
from wavenet_tpu.audio.streaming import StreamingAudioDataset
from wavenet_tpu.config import MelConfig, WaveNetConfig


def cfg_(**kw):
    base = dict(num_blocks=1, max_dilation=8, residual_channels=8,
                skip_channels=8, batch_size=4, train_window=256,
                sample_rate=8000)
    base.update(kw)
    return WaveNetConfig(**base)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    for i in range(6):
        n = int(rng.integers(2000, 6000))
        t = np.arange(n) / 8000
        f = float(rng.uniform(100, 800))
        x = (0.4 * np.sin(2 * np.pi * f * t)).astype(np.float32)
        # two files at a different rate to exercise header-length resampling
        rate = 16000 if i % 3 == 0 else 8000
        if rate != 8000:
            x = np.repeat(x, 2)
        write_wav(str(root / f"c{i}.wav"), x, rate)
    return str(root)


def batches(ds, n, **kw):
    st = IteratorState(seed=0, step=0)
    out = []
    for _ in range(n):
        b, st = ds.sample_batch(st, **kw)
        out.append(b)
    return out


def test_matches_in_memory_dataset(corpus):
    cfg = cfg_()
    mem = AudioDataset.from_dir(corpus, cfg)
    stream = StreamingAudioDataset.from_dir(corpus, cfg, cache_clips=2)
    for bm, bs in zip(batches(mem, 5), batches(stream, 5)):
        np.testing.assert_array_equal(bs["tokens"], bm["tokens"])


def test_matches_with_mel(corpus):
    mel = MelConfig(num_mels=8, hop_length=16, win_length=64, fmax=4000.0,
                    upsample_factors=(4, 4))
    cfg = cfg_(mel=mel)
    mem = AudioDataset.from_dir(corpus, cfg)
    stream = StreamingAudioDataset.from_dir(corpus, cfg, cache_clips=3)
    for bm, bs in zip(batches(mem, 3), batches(stream, 3)):
        np.testing.assert_array_equal(bs["tokens"], bm["tokens"])
        np.testing.assert_array_equal(bs["mel"], bm["mel"])


def test_cache_bounded(corpus):
    cfg = cfg_()
    stream = StreamingAudioDataset.from_dir(corpus, cfg, cache_clips=2)
    batches(stream, 6)
    assert len(stream._cache) <= 2


def test_exact_resume(corpus):
    """Resume from a saved IteratorState reproduces the identical stream."""
    cfg = cfg_()
    stream = StreamingAudioDataset.from_dir(corpus, cfg)
    st = IteratorState(seed=0, step=0)
    for _ in range(3):
        _, st = stream.sample_batch(st)
    saved = st
    want, _ = stream.sample_batch(saved)
    fresh = StreamingAudioDataset.from_dir(corpus, cfg)
    got, _ = fresh.sample_batch(saved)
    np.testing.assert_array_equal(got["tokens"], want["tokens"])


def test_prefetch_parity(corpus):
    cfg = cfg_()
    plain = StreamingAudioDataset.from_dir(corpus, cfg)
    pf = StreamingAudioDataset.from_dir(corpus, cfg, prefetch=3)
    pf.start_prefetch(IteratorState(seed=0, step=0))
    try:
        for bp, bq in zip(batches(plain, 6), batches(pf, 6)):
            np.testing.assert_array_equal(bq["tokens"], bp["tokens"])
    finally:
        pf.stop_prefetch()


def test_prefetch_resync_after_restore(corpus):
    """A state jump (checkpoint restore) transparently resynchronizes."""
    cfg = cfg_()
    pf = StreamingAudioDataset.from_dir(corpus, cfg, prefetch=2)
    pf.start_prefetch(IteratorState(seed=0, step=0))
    try:
        jumped = IteratorState(seed=0, step=7)
        got, _ = pf.sample_batch(jumped)
        plain = StreamingAudioDataset.from_dir(corpus, cfg)
        want, _ = plain.sample_batch(jumped)
        np.testing.assert_array_equal(got["tokens"], want["tokens"])
    finally:
        pf.stop_prefetch()


def test_row_slicing_matches_global(corpus):
    """rows= materializes exactly that slice of the global batch (per-host
    IO sharding keeps global determinism)."""
    cfg = cfg_()
    full_ds = StreamingAudioDataset.from_dir(corpus, cfg)
    part_ds = StreamingAudioDataset.from_dir(corpus, cfg)
    st = IteratorState(seed=0, step=4)
    full, _ = full_ds.sample_batch(st)
    lo, _ = part_ds.sample_batch(st, rows=slice(0, 2))
    hi, _ = part_ds.sample_batch(st, rows=slice(2, 4))
    np.testing.assert_array_equal(np.concatenate([lo["tokens"],
                                                  hi["tokens"]]),
                                  full["tokens"])


def test_trainer_runs_on_streaming(corpus):
    from wavenet_tpu.training.trainer import Trainer
    cfg = cfg_(train_window=512, compute_dtype="float32")
    ds = StreamingAudioDataset.from_dir(corpus, cfg)
    tr = Trainer(cfg, ds)
    m = tr.run(num_steps=3, log_every=0)
    assert np.isfinite(m["loss"])
