"""Orbax-backed checkpointing — one system replacing the reference's four
(seggroup .t7 epoch/last pairs train.py:216-220, pointgroup pow2-retention
util/utils.py:85-98, kpconv tf.Saver, minkowski best-val lib/train.py:143-155).
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def restore(self, step: int | None = None, template: Any = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(step)

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()
