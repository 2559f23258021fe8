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
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from wavenet_tpu.audio.dataset import IteratorState
from wavenet_tpu.config import WaveNetConfig


class CheckpointManager:
    def __init__(self, directory: str, cfg: WaveNetConfig,
                 max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.cfg = cfg
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True)
        self.mgr = ocp.CheckpointManager(self.directory, options=options)
        # config JSON beside the checkpoints (reference parity)
        cfg_path = os.path.join(self.directory, "params.json")
        if jax.process_index() == 0 and not os.path.exists(cfg_path):
            with open(cfg_path, "w") as f:
                f.write(cfg.to_json())

    def save(self, step: int, state: Any, iter_state: IteratorState,
             wait: bool = False) -> None:
        """Async by default; the train loop keeps running while tensorstore
        writes shards in the background."""
        payload = {
            "state": ocp.args.StandardSave(state),
            "iterator": ocp.args.JsonSave(
                {"seed": iter_state.seed, "step": iter_state.step}),
        }
        self.mgr.save(step, args=ocp.args.Composite(**payload))
        if wait:
            self.mgr.wait_until_finished()

    def restore(self, abstract_state: Any, step: Optional[int] = None
                ) -> Tuple[Any, IteratorState]:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = self.mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state),
                iterator=ocp.args.JsonRestore(),
            ))
        it = restored["iterator"]
        return restored["state"], IteratorState(seed=it["seed"],
                                                step=it["step"])

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def wait(self):
        self.mgr.wait_until_finished()

    @staticmethod
    def load_config(directory: str) -> WaveNetConfig:
        with open(os.path.join(directory, "params.json")) as f:
            return WaveNetConfig.from_json(f.read())
