"""ctypes bindings for the native C++ data-loader (cpp/fastloader.cpp).

Compiles the shared library on first use (g++ -O3 -shared, cached under
build/) and exposes NumPy-friendly wrappers.  Falls back cleanly: callers
should use `available()` and keep the pure-NumPy path as the reference
implementation (audio/mulaw.py, audio/dataset.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "cpp", "fastloader.cpp")
_SO = os.path.join(_ROOT, "build", "fastloader.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    # compile to a process-unique temp path and os.replace into place:
    # two processes racing a first build would interleave writes into one
    # .so (corrupt ELF), and the mtime check would then cache the corpse
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-shared",
           "-o", tmp, _SRC, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)                     # atomic on POSIX
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.mulaw_encode.argtypes = [f32p, ctypes.c_int64, ctypes.c_int32, i32p]
        lib.mulaw_decode.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32, f32p]
        lib.gather_windows.argtypes = [i32p, i64p, i32p, i64p,
                                       ctypes.c_int64, ctypes.c_int64, i32p,
                                       ctypes.c_int32]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def mulaw_encode(x: np.ndarray, quantization_channels: int = 256) -> np.ndarray:
    lib = _load()
    assert lib is not None
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(x.shape, np.int32)
    lib.mulaw_encode(x.ravel(), x.size, quantization_channels,
                     out.reshape(-1))
    return out


def mulaw_decode(q: np.ndarray, quantization_channels: int = 256) -> np.ndarray:
    lib = _load()
    assert lib is not None
    q = np.ascontiguousarray(q, np.int32)
    out = np.empty(q.shape, np.float32)
    lib.mulaw_decode(q.ravel(), q.size, quantization_channels,
                     out.reshape(-1))
    return out


class WindowGatherer:
    """Pre-flattened clip store + fast batched window gather."""

    def __init__(self, clips):
        self.offsets = np.zeros(len(clips), np.int64)
        acc = 0
        for i, c in enumerate(clips):
            self.offsets[i] = acc
            acc += len(c)
        self.flat = np.ascontiguousarray(
            np.concatenate([np.asarray(c, np.int32) for c in clips]))
        self.lengths = np.asarray([len(c) for c in clips], np.int64)

    def gather(self, clip_idx: np.ndarray, starts: np.ndarray,
               window: int, num_threads: int = 4) -> np.ndarray:
        lib = _load()
        assert lib is not None
        clip_idx = np.ascontiguousarray(clip_idx, np.int32)
        starts = np.ascontiguousarray(starts, np.int64)
        # the C++ path does no bounds checks: a bad draw would silently
        # gather the NEXT clip's tokens (bit-valid, wrong training data)
        if clip_idx.size:
            if clip_idx.min() < 0 or clip_idx.max() >= len(self.lengths):
                raise IndexError("clip_idx out of range")
            if (starts < 0).any() or (
                    starts + window > self.lengths[clip_idx]).any():
                raise IndexError("window overruns clip")
        out = np.empty((len(clip_idx), window), np.int32)
        # thread spawn/join costs more than the memcpy below ~1 MiB total
        if len(clip_idx) * window * 4 < (1 << 20):
            num_threads = 1
        lib.gather_windows(self.flat, self.offsets, clip_idx, starts,
                           len(clip_idx), window, out, num_threads)
        return out
