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


def graft_pretrain(pretrain_path: str, state: TrainState) -> TrainState:
    """Cold-start from a previous stage's checkpoint: copy every param /
    batch-stat subtree whose name and shape match, keep newly initialized
    ones (e.g. stage-2 adds encoder{1,2}_linear).

    Reference: main_contrast.py:52-67 — `--pretrain` loads the stage-1
    checkpoint with `module.`-prefix key surgery and partial matching.
    pretrain_path points at one orbax step dir (save/<run>/<epoch>) or a
    run dir (latest step used)."""
    import numpy as np

    path = os.path.abspath(pretrain_path)
    if not os.path.isdir(path):
        raise FileNotFoundError(path)
    # run dir -> latest numeric step; CheckpointManager nests under
    # <step>/default/
    entries = [d for d in os.listdir(path) if d.isdigit()]
    if entries:
        path = os.path.join(path, str(max(int(d) for d in entries)))
    if os.path.isdir(os.path.join(path, "default")):
        path = os.path.join(path, "default")
    raw = ocp.StandardCheckpointer().restore(path)

    def merge(dst, src, label):
        n = [0]

        def rec(d, s):
            out = {}
            for k, v in d.items():
                if hasattr(v, "items"):
                    out[k] = rec(v, s.get(k, {})) if hasattr(
                        s.get(k, {}), "items") else v
                else:
                    sv = s.get(k) if hasattr(s, "get") else None
                    if sv is not None and np.shape(sv) == np.shape(v):
                        out[k] = sv
                        n[0] += 1
                    else:
                        out[k] = v
            return out

        merged = rec(dst, src or {})
        print(f"=> grafted {n[0]} {label} tensors from {path}")
        return merged

    new_params = merge(state.params, raw.get("params"), "param")
    new_bs = merge(state.batch_stats, raw.get("batch_stats"), "batch-stat")
    new_state = state.replace(params=new_params, batch_stats=new_bs)
    mem = raw.get("memory")
    if mem is not None and state.memory is not None:
        banks = mem.get("banks") if hasattr(mem, "get") else None
        if banks is not None and np.shape(banks) == np.shape(
                state.memory.banks):
            new_state = new_state.replace(
                memory=state.memory.replace(banks=banks))
            print("=> grafted memory banks")
    return new_state
