"""Training data pipeline: wav clips -> mu-law tokens -> deterministic
random-crop minibatches.

Role parity with the reference's train-script data loading (SURVEY.md §2 #2:
"read wavs, resample, mono-ize, random-crop fixed-length windows, batch"),
rebuilt with two framework-grade properties the reference lacks:

  * **Deterministic, checkpointable iterator state** — a batch is a pure
    function of (seed, step), so resume-after-preemption is exact
    (SURVEY.md §5.3).  The state is two integers.
  * **Host/device split** — the host produces int32 token windows (cheap);
    embedding/one-hot happens on device inside the jitted step.

When a fast path is needed, `wavenet_tpu.cpp` provides a native C++ crop/
encode kernel behind the same interface.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from wavenet_tpu.audio import mel as mel_lib
from wavenet_tpu.audio import mulaw
from wavenet_tpu.audio.io import list_wavs, read_wav
from wavenet_tpu.config import WaveNetConfig


def speakers_from_dir(root: str, paths: Sequence[str],
                      cfg: WaveNetConfig) -> Optional[List[int]]:
    """Per-clip global-conditioning class ids from the corpus layout: each
    clip's id is its top-level subdirectory index under `root` (sorted
    order, root/<speaker>/<clip>.wav); clips directly under root map to
    class 0.  None when cfg.global_classes is unset."""
    import os
    if cfg.global_classes is None:
        return None
    rootp = os.path.abspath(root)

    def subdir(p):
        rel = os.path.relpath(os.path.abspath(p), rootp)
        return rel.split(os.sep)[0] if os.sep in rel else ""

    names = sorted({subdir(p) for p in paths})
    if len(names) > cfg.global_classes:
        raise ValueError(
            f"{len(names)} speaker subdirectories under {root} but "
            f"global_classes={cfg.global_classes}")
    idx = {n: i for i, n in enumerate(names)}
    return [idx[subdir(p)] for p in paths]


@dataclasses.dataclass(frozen=True)
class IteratorState:
    """Complete, serializable state of the data iterator."""
    seed: int
    step: int

    def next(self) -> "IteratorState":
        return IteratorState(self.seed, self.step + 1)


class AudioDataset:
    """In-memory dataset of mu-law-encoded clips.

    Clips shorter than the training window are dropped at load (matching the
    obvious behavior of crop-based training; a pad-short-clips mode can be
    added when needed).
    """

    def __init__(self, clips: Sequence[np.ndarray], cfg: WaveNetConfig,
                 speakers: Optional[Sequence[int]] = None):
        self.cfg = cfg
        window = cfg.train_window + 1          # +1: input/target offset pair
        if speakers is not None and len(speakers) != len(clips):
            raise ValueError("speakers must align 1:1 with clips")
        sp_in = (speakers if speakers is not None else [0] * len(clips))
        kept_sp = [s for c, s in zip(clips, sp_in) if len(c) >= window]
        kept = [c for c in clips if len(c) >= window]
        if not kept:
            raise ValueError(
                f"no clip is >= train_window+1 = {window} samples")
        # global-conditioning class ids (paper §2.5 eq.2, e.g. speaker id):
        # explicit per-clip, or clip-index mod classes as a deterministic
        # default (synthetic corpora)
        self.speakers: Optional[np.ndarray] = None
        if cfg.global_classes is not None:
            if speakers is not None:
                sp = np.asarray(kept_sp, np.int32)
            else:
                sp = np.arange(len(kept), dtype=np.int32) % cfg.global_classes
            if sp.size and (sp.min() < 0 or sp.max() >= cfg.global_classes):
                raise ValueError("speaker id out of range for global_classes")
            self.speakers = sp
        self.tokens: List[np.ndarray] = [
            mulaw.encode_np(c, cfg.quantization_channels) for c in kept]
        self.waveforms = kept
        self.mels: Optional[List[np.ndarray]] = None
        if cfg.mel is not None:
            self.mels = [
                mel_lib.log_mel(c, cfg.sample_rate, cfg.mel) for c in kept]
        # native C++ batched window gather (bit-identical fast path; the
        # NumPy loop below stays as the reference implementation)
        self._gatherer = None
        try:
            from wavenet_tpu.cpp import loader as _cpp
            if _cpp.available():
                self._gatherer = _cpp.WindowGatherer(self.tokens)
        except Exception:
            pass

    # ---- constructors ----

    @classmethod
    def from_dir(cls, root: str, cfg: WaveNetConfig) -> "AudioDataset":
        """Load every .wav under `root`.  With cfg.global_classes set, the
        speaker id of each clip is its top-level subdirectory index (sorted
        order) — the conventional multi-speaker corpus layout
        root/<speaker>/<clip>.wav; clips directly under root get class 0."""
        paths = list_wavs(root)
        if not paths:
            raise FileNotFoundError(f"no .wav under {root}")
        clips = [read_wav(p, cfg.sample_rate)[0] for p in paths]
        return cls(clips, cfg, speakers=speakers_from_dir(root, paths, cfg))

    @classmethod
    def synthetic(cls, cfg: WaveNetConfig, num_clips: int = 4,
                  clip_seconds: float = 2.0, seed: int = 0) -> "AudioDataset":
        """Deterministic sine-mixture clips for tests and benchmarks."""
        rng = np.random.default_rng(seed)
        sr = cfg.sample_rate
        T = int(clip_seconds * sr)
        t = np.arange(T) / sr
        clips = []
        for _ in range(num_clips):
            freqs = rng.uniform(80, 2000, size=3)
            amps = rng.uniform(0.1, 0.3, size=3)
            phases = rng.uniform(0, 2 * np.pi, size=3)
            x = sum(a * np.sin(2 * np.pi * f * t + ph)
                    for f, a, ph in zip(freqs, amps, phases))
            clips.append(np.asarray(x, np.float32))
        return cls(clips, cfg)

    # ---- batching ----

    def sample_batch(self, state: IteratorState,
                     batch_size: Optional[int] = None,
                     ) -> Tuple[Dict[str, np.ndarray], IteratorState]:
        """Pure function of `state`: deterministic random-crop batch.

        Returns {"tokens": [B, W+1] int32} (+ {"mel": [B, F, M]} when
        conditioning), and the advanced iterator state.
        """
        cfg = self.cfg
        B = batch_size or cfg.batch_size
        W = cfg.train_window
        rng = np.random.default_rng((self.cfg.seed, state.seed, state.step))
        hop = cfg.mel.hop_length if cfg.mel is not None else 1

        mels = None
        if self.mels is not None:
            F = W // hop
            mels = np.empty((B, F, cfg.mel.num_mels), np.float32)

        # the random draws are identical on both paths (pure fn of `rng`)
        clip_idx = np.empty(B, np.int32)
        starts = np.empty(B, np.int64)
        for i in range(B):
            ci = int(rng.integers(0, len(self.tokens)))
            max_start = len(self.tokens[ci]) - (W + 1)
            s = int(rng.integers(0, max_start + 1))
            if mels is not None:
                # align crop start to a mel hop boundary so frame fs maps to
                # sample s exactly
                s = (s // hop) * hop
                mels[i] = self.mels[ci][s // hop:s // hop + W // hop]
            clip_idx[i], starts[i] = ci, s

        if self._gatherer is not None:
            toks = self._gatherer.gather(clip_idx, starts, W + 1)
        else:
            toks = np.empty((B, W + 1), np.int32)
            for i in range(B):
                toks[i] = self.tokens[clip_idx[i]][starts[i]:starts[i] + W + 1]
        batch: Dict[str, np.ndarray] = {"tokens": toks}
        if mels is not None:
            batch["mel"] = mels
        if self.speakers is not None:
            batch["speaker"] = self.speakers[clip_idx]
        return batch, state.next()
