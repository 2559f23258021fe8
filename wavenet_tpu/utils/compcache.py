"""Persistent XLA compilation cache for serving and CLI cold starts.

Why this exists: decode graphs with unrolled layer scans compile in ~100 s
cold on the v5e toolchain (measured, `tools/tpu_full_decode_profile.py`),
which round 4 judged "wrong for serving/test latency" as a *per-process*
cost.  JAX's persistent compilation cache keys executables on
(HLO, backend, compiler flags) and reuses them across processes, turning
that cost into a once-per-machine one — which is what makes perf knobs
like ``WaveNetConfig.decode_unroll`` deployable.

No reference counterpart (SURVEY.md §1: the reference has no serving or
process-restart story at all); this is framework infrastructure.

Usage:  ``compcache.enable()`` before the first jit dispatch, or pass
``--compile-cache [DIR]`` to `serve.py` / `generate.py`.  The default
directory is ``$WAVENET_TPU_COMPILE_CACHE`` or ``runs/.xla_cache`` under
the repo root (gitignored).
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT_SUBDIR = os.path.join("runs", ".xla_cache")
_enabled_dir: Optional[str] = None


def default_dir() -> str:
    env = os.environ.get("WAVENET_TPU_COMPILE_CACHE")
    if env:
        return env
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(repo_root, _DEFAULT_SUBDIR)


def enable(path: Optional[str] = None,
           min_compile_secs: float = 1.0) -> str:
    """Point jax at a persistent on-disk compilation cache and return the
    directory used.  Idempotent; safe to call before or after backend init
    (the cache is consulted per-compile, not at backend creation).

    min_compile_secs: only compilations at least this slow are persisted —
    keeps the cache from filling with trivial sub-second kernels while
    still catching every graph a restart would actually wait on.
    """
    global _enabled_dir
    import jax

    d = os.path.abspath(path or default_dir())
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    # cache even small executables (decode steps are latency-, not
    # size-critical); -1 disables the entry-size floor
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled_dir = d
    return d


def enabled_dir() -> Optional[str]:
    """The active cache directory, or None when disabled."""
    return _enabled_dir


def add_cli_flag(parser) -> None:
    """Attach the shared ``--compile-cache`` flag to an argparse parser."""
    parser.add_argument(
        "--compile-cache", nargs="?", const="", default=None,
        metavar="DIR",
        help="enable the persistent XLA compilation cache (executables "
             "reused across process restarts); DIR defaults to "
             "$WAVENET_TPU_COMPILE_CACHE or runs/.xla_cache")


def enable_from_args(args) -> Optional[str]:
    """Honor the --compile-cache flag if present and set."""
    val = getattr(args, "compile_cache", None)
    if val is None:
        return None
    return enable(val or None)
