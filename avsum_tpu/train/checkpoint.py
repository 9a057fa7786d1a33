"""Orbax checkpoint/resume (SURVEY.md §5.4 — the reference persists nothing;
training ends with weights in memory, no torch.save exists anywhere)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from avsum_tpu.train.steps import TrainState


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager storing (TrainState, meta)."""

    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=False
            ),
        )

    def save(self, step: int, state: TrainState, meta: Optional[dict] = None):
        args = {"state": ocp.args.StandardSave(state)}
        if meta:
            args["meta"] = ocp.args.JsonSave(meta)
        self._mgr.save(step, args=ocp.args.Composite(**args))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: TrainState, step: Optional[int] = None):
        """Restore into the structure of ``state_template`` (shapes/shardings
        come from the template, so restore works across mesh layouts)."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None, None
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract),
                meta=ocp.args.JsonRestore(),
            ),
        )
        return restored.get("state"), restored.get("meta")

    def close(self):
        self._mgr.close()
