"""Sharded checkpoint/resume via orbax (SURVEY.md §5.4).

Saves params + optimizer state + step + data-iterator state, with the config
JSON written alongside — mirroring the reference's params-JSON-next-to-HDF5
layout (musyoku/wavenet saves a params JSON beside Chainer HDF5 snapshots;
SURVEY.md §3.4) but with multi-host sharded arrays: each host writes its own
shards through orbax/tensorstore, no single-host gather.

Resume is EXACT: the iterator state (seed, step) makes the next batch
identical to what an uninterrupted run would have seen (SURVEY.md §5.3).
"""

from __future__ import annotations

import json
import os
import weakref
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from wavenet_tpu.audio.dataset import IteratorState
from wavenet_tpu.config import WaveNetConfig

# Live managers, so restore()/latest_step() can observe every in-flight
# async save to their directory from THIS process — even one started by a
# DIFFERENT CheckpointManager instance (the round-4 suite race: trainer A
# queues an async save, a fresh manager B restores before tensorstore
# finishes, FileNotFoundError).  Durability is a guarantee of the public
# API, not a convention callers must remember (SURVEY.md §5.3/§5.4).
_LIVE: "weakref.WeakSet[CheckpointManager]" = weakref.WeakSet()
# STRONG refs per directory for managers with a QUEUED async save: a
# caller may drop its last reference while tensorstore still writes in
# the background, and a WeakSet would forget the save existed (round-5
# review).  Entries are released as soon as the save is waited out, so
# this never grows beyond the set of managers with in-flight saves.
_PENDING: dict = {}


def _wait_directory(directory: str) -> None:
    """Block until every in-flight save to `directory` from this process
    has landed (cross-process saves are invisible here, but orbax commits
    atomically — a reader in another process sees either nothing or a
    complete step, never a partial one)."""
    for m in list(_LIVE):
        if m.directory == directory:
            m.mgr.wait_until_finished()
    for m in list(_PENDING.pop(directory, ())):
        m.mgr.wait_until_finished()


class CheckpointManager:
    def __init__(self, directory: str, cfg: WaveNetConfig,
                 max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.cfg = cfg
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True)
        self.mgr = ocp.CheckpointManager(self.directory, options=options)
        _LIVE.add(self)
        # config JSON beside the checkpoints (reference parity)
        cfg_path = os.path.join(self.directory, "params.json")
        if os.path.exists(cfg_path):
            # a stale ARCHITECTURE config silently mis-restores (orbax
            # shape errors at best; wrong sample_rate/quantization would
            # not even crash) — refuse to mix model shapes in one
            # directory.  Training-schedule fields (lr, ema_decay,
            # parallelism, batch/window) may legitimately differ across
            # resumes (e.g. the EMA cross-compat path) and are not checked.
            with open(cfg_path) as f:
                existing = WaveNetConfig.from_json(f.read())
            diff = [k for k in self._ARCH_FIELDS
                    if getattr(existing, k) != getattr(cfg, k)]
            if diff:
                raise ValueError(
                    f"{cfg_path} was written for a different model "
                    f"architecture (fields differ: {diff}); use a fresh "
                    f"checkpoint directory")
        elif jax.process_index() == 0:
            # atomic write: other processes may construct their
            # CheckpointManager concurrently and read this file — they must
            # see nothing (skip validation) or the complete JSON, never a
            # truncated prefix
            tmp = f"{cfg_path}.{os.getpid()}.tmp"
            with open(tmp, "w") as f:
                f.write(cfg.to_json())
            os.replace(tmp, cfg_path)

    # every field that changes the parameter tree's SHAPES or the meaning
    # of the stored values (param_dtype changes stored dtypes; sample_rate/
    # quantization change what the numbers mean even where shapes agree)
    _ARCH_FIELDS = ("num_blocks", "max_dilation", "kernel_size",
                    "residual_channels", "skip_channels", "causal_channels",
                    "quantization_channels", "sample_rate", "param_dtype",
                    "mel", "global_classes", "global_channels")

    @staticmethod
    def _state_tree(state: Any):
        """Serialize NamedTuple states as dicts, DROPPING None-valued
        optional fields (e.g. TrainState.ema when EMA is off): a None field
        still creates a tree key in orbax, which would make every optional
        field a checkpoint-format break."""
        if hasattr(state, "_asdict"):
            d = dict(state._asdict())
            return {k: v for k, v in d.items() if v is not None}
        return state

    def save(self, step: int, state: Any, iter_state: IteratorState,
             wait: bool = False) -> None:
        """Async by default; the train loop keeps running while tensorstore
        writes shards in the background."""
        payload = {
            "state": ocp.args.StandardSave(self._state_tree(state)),
            "iterator": ocp.args.JsonSave(
                {"seed": iter_state.seed, "step": iter_state.step}),
        }
        self.mgr.save(step, args=ocp.args.Composite(**payload))
        if wait:
            self.mgr.wait_until_finished()
            _PENDING.get(self.directory, set()).discard(self)
        else:
            # keep a strong ref until someone waits this save out — the
            # caller may drop theirs while the write is still in flight
            _PENDING.setdefault(self.directory, set()).add(self)

    def _settle(self):
        """Durability barrier for reads: wait out every in-flight save to
        this directory from this process, then RELOAD the step cache —
        orbax caches the directory listing at construction, so a save
        committed by another manager instance after this one was built is
        invisible without the reload (caught by
        test_async_save_is_durable_for_fresh_manager under suite load)."""
        _wait_directory(self.directory)
        try:
            self.mgr.reload()
        except AttributeError:      # older orbax: no cache, no reload
            pass

    def restore(self, abstract_state: Any, step: Optional[int] = None
                ) -> Tuple[Any, IteratorState]:
        # a restore must never observe a half-written/absent checkpoint this
        # process just queued: settle every in-flight save first
        self._settle()
        step = self.mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        cls = type(abstract_state) if hasattr(abstract_state, "_asdict") \
            else None
        tree = self._state_tree(abstract_state)
        if cls is not None:
            # tolerate ema presence mismatches in either direction (resume
            # an old run with EMA newly on, or with EMA turned off); probe
            # the top-level keys straight from the step's _METADATA (both
            # NamedTuple- and dict-saved states serialize by field name)
            try:
                meta_path = os.path.join(self.directory, str(step), "state",
                                         "_METADATA")
                with open(meta_path) as f:
                    tm = json.load(f)["tree_metadata"]
                disk_keys = {k.split("'")[1] for k in tm}
            except Exception:
                disk_keys = None
            if disk_keys is not None:
                if "ema" in tree and "ema" not in disk_keys:
                    tree = {k: v for k, v in tree.items() if k != "ema"}
                elif "ema" not in tree and "ema" in disk_keys:
                    tree = dict(tree, ema=tree["params"])
        def _do(tree):
            return self.mgr.restore(
                step,
                args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(tree),
                    iterator=ocp.args.JsonRestore(),
                ))

        try:
            restored = _do(tree)
        except ValueError as e:
            # self-heal if the metadata probe missed (e.g. an orbax layout
            # change): toggle the ema key and retry once
            if cls is None or "ema" not in str(e):
                raise
            tree = ({k: v for k, v in tree.items() if k != "ema"}
                    if "ema" in tree else dict(tree, ema=tree["params"]))
            restored = _do(tree)
        rs = restored["state"]
        if cls is not None:
            fields = {f: rs.get(f) for f in cls._fields if f in rs}
            state = cls(**fields)
            if getattr(abstract_state, "ema", None) is not None \
                    and state.ema is None:
                # EMA enabled on a pre-EMA checkpoint: start the average
                # from a COPY of the restored params (aliasing them would
                # double-donate the buffers in the donated train step)
                state = state._replace(
                    ema=jax.tree.map(jax.numpy.copy, state.params))
            if getattr(abstract_state, "ema", "x") is None:
                state = state._replace(ema=None)
        else:
            state = rs
        it = restored["iterator"]
        return state, IteratorState(seed=it["seed"], step=it["step"])

    def latest_step(self) -> Optional[int]:
        self._settle()
        return self.mgr.latest_step()

    def wait(self):
        self.mgr.wait_until_finished()
        _PENDING.get(self.directory, set()).discard(self)

    @staticmethod
    def load_config(directory: str) -> WaveNetConfig:
        with open(os.path.join(directory, "params.json")) as f:
            return WaveNetConfig.from_json(f.read())
