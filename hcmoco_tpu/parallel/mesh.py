"""Device mesh + sharding helpers.

Replaces the reference's SLURM/NCCL process-group bootstrap
(`pycontrast/learning/base_trainer.py:20-73`) with a `jax.sharding.Mesh`:
one jitted global-view program, batch sharded over the `data` axis, params
and memory banks replicated.  XLA inserts the all-gather that the reference
performs explicitly per step (`_global_gather`, contrast_trainer.py:160-165)
and the gradient all-reduce that DDP performs in its backward hooks — both
ride ICI within a slice.  Multi-host extends the same program over DCN via
`jax.distributed.initialize` (no code changes here).

The mesh reserves a `model` axis for future tensor parallelism; HCMoCo's
models are small CNNs (HRNet-W18 ≈ 9.6M params) so v1 recipes keep
model_parallelism=1 (SURVEY.md §2.9).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = -1, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ('data', 'model') mesh. n_data=-1 uses all devices / n_model."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data == -1:
        n_data = len(devices) // n_model
    use = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays, batch-dim sharded over 'data'.

    Under multi-process (`jax.distributed.initialize`, the reference's
    multi-node DDP analog) each process passes its LOCAL batch portion and
    the pytree is assembled into the global sharded array — the moral
    equivalent of DistributedSampler feeding per-rank loaders
    (base_trainer.py:120-141)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return multihost_utils.host_local_array_to_global_array(
            batch, mesh, P("data"))
    sh = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)
