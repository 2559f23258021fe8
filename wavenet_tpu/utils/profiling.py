"""Tracing/profiling subsystem (SURVEY.md §5.1).

The reference had nothing beyond print-timings; here: jax.profiler traces
(perfetto/xprof-compatible dumps), named_scope annotation helpers, and
block_until_ready-bracketed step timing.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace into `log_dir` (view with xprof/perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def profiled_steps(trainer, log_dir: str, start: int = 10, stop: int = 15):
    """Wrap Trainer.run so steps [start, stop) are traced: installs a hook
    via the trainer's log_fn-free path by monkey-wrapping its compiled step."""
    orig = trainer._step
    state = {"i": 0, "on": False}

    def wrapped(*a, **kw):
        if state["i"] == start:
            jax.profiler.start_trace(log_dir)
            state["on"] = True
        out = orig(*a, **kw)
        state["i"] += 1
        if state["i"] == stop and state["on"]:
            jax.block_until_ready(out[1]["loss"])
            jax.profiler.stop_trace()
            state["on"] = False
        return out

    trainer._step = wrapped
    try:
        yield
    finally:
        trainer._step = orig
        if state["on"]:
            jax.profiler.stop_trace()


def timeit(fn: Callable, *args, warmup: int = 2, iters: int = 10,
           **kwargs) -> float:
    """Median wall-clock seconds per call, compile excluded."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


named_scope = jax.named_scope
