"""Train state: params + BN stats + optimizer + memory banks, one pytree.

The reference keeps these in four separate stateful objects (DDP model,
`contrast` memory module, torch optimizer, epoch int — see the checkpoint
dict, contrast_trainer.py:117-140).  Here they form a single flax struct so
the whole training step is a pure function (state, batch, rng) -> state and
checkpointing is one orbax save.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax import linen as nn

from ..core.config import TrainConfig
from ..contrast.memory import MemoryState, MoCoState, init_memory, init_moco
from .schedules import learning_rate_fn


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # () int32 global iteration
    params: Any
    batch_stats: Any
    opt_state: Any
    memory: Optional[MemoryState] = None
    moco: Optional[MoCoState] = None
    params_ema: Any = None  # momentum encoder (moco only)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    """SGD + momentum + L2, torch semantics: grad += wd*p, then heavyball
    momentum buffer, update = -lr * buf (main_contrast.py optimizer)."""
    lr_fn = learning_rate_fn(cfg, steps_per_epoch)
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.trace(decay=cfg.momentum, nesterov=False),
        optax.scale_by_learning_rate(lr_fn),  # includes the -1 sign
    ), lr_fn


def create_train_state(
    cfg: TrainConfig,
    model: nn.Module,
    rng: jax.Array,
    example_batch: dict,
    n_data: int,
    steps_per_epoch: int,
) -> TrainState:
    init_rng, mem_rng = jax.random.split(rng)
    eb = example_batch
    if cfg.arch == "HRNetPN":
        variables = model.init(
            init_rng, eb["rgbd"][:1], eb["skeleton"][:1],
            eb["depth_mask"][:1], eb["grid_xy"][:1], cfg.pn_ori_h,
            cfg.pn_ori_w, eb["depth_mean"][:1], train=False,
            return_fm=cfg.linear_feat_map)
    elif cfg.modal == "RGBD2S" and "skeleton" in eb:
        # dispatch on the MODAL, not the batch keys: the synthetic source
        # emits every modality, but CMC/RGB models take only the image
        variables = model.init(
            init_rng, eb["rgbd"][:1], eb["skeleton"][:1],
            train=False, return_fm=cfg.linear_feat_map)
    else:
        variables = model.init(init_rng, eb["rgbd"][:1], train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    tx, _ = make_optimizer(cfg, steps_per_epoch)
    opt_state = tx.init(params)

    n_modal = {"RGB": 1, "CMC": 2, "RGBD2S": 3}[cfg.modal]
    memory = None
    moco = None
    if cfg.mem.startswith("bank"):
        memory = init_memory(mem_rng, n_modal, n_data, cfg.feat_dim)
    else:
        moco = init_moco(mem_rng, n_modal, cfg.nce_k, cfg.feat_dim)

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        memory=memory,
        moco=moco,
        params_ema=jax.tree_util.tree_map(jnp.copy, params)
        if cfg.mem == "moco" else None,
    )
