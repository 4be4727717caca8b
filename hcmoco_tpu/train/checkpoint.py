"""Checkpoint save/resume via orbax.

Reference semantics (`contrast_trainer.py:93-140`): every epoch write
`current` (model + contrast memory banks + optimizer + epoch), plus a
retained snapshot every `save_freq` epochs; resume restores everything
including the banks.  Here the whole TrainState is one pytree so a single
orbax save captures params, BN stats, optimizer trace, memory banks and the
step counter atomically."""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, save_freq: int = 20,
                 max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        self.save_freq = save_freq
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                create=True,
            ),
        )

    def save(self, epoch: int, state: TrainState, force: bool = False):
        """Save as `current` every call; retained snapshot on save_freq."""
        self._mgr.save(epoch, args=ocp.args.StandardSave(state),
                       force=force)
        self._mgr.wait_until_finished()

    def restore(self, state: TrainState,
                epoch: Optional[int] = None) -> Tuple[TrainState, int]:
        """Restore latest (or a specific epoch); returns (state, epoch)."""
        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            return state, 0
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state))
        return restored, step

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()
