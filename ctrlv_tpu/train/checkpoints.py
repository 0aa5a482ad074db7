"""Checkpoint/resume via Orbax (async, step dirs, rotation, resume-latest).

Behavioral parity: the reference's accelerate `save_state` checkpoints —
`checkpoint-{step}` directories with `checkpoints_total_limit` rotation and
`--resume_from_checkpoint latest` picking the max step
(/root/reference/tools/train_video_diffusion.py:300-323,562-586).

TPU-native: Orbax async checkpointing (no GIL stall on the train loop) of
pure pytrees; HF-format export lives in ctrlv_tpu.train.hf_import.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        max_to_keep: Optional[int] = None,
        async_save: bool = True,
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            step_prefix="checkpoint",
            enable_async_checkpointing=async_save,
        )
        self._mngr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, tree: Any, wait: bool = False) -> None:
        self._mngr.save(step, args=ocp.args.StandardSave(tree))
        if wait:
            self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        """Restore a checkpoint; step=None -> latest (reference 'latest')."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        if template is not None:
            return self._mngr.restore(step, args=ocp.args.StandardRestore(template))
        return self._mngr.restore(step)

    def wait(self):
        self._mngr.wait_until_finished()

    def close(self):
        self._mngr.close()
