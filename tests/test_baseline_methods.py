"""Baseline method paths: CMC bank, CMC MoCo, PIRL jigsaw (the non-HCMoCo
presets of the override_dict, base_options.py:12-22)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hcmoco_tpu.core.config import TrainConfig, resolve_config
from hcmoco_tpu.models.build import build_model
from hcmoco_tpu.train.state import create_train_state
from hcmoco_tpu.train.contrast_step import make_contrast_train_step

N_DATA = 32


def run_one(cfg, batch):
    model = build_model(cfg)
    init_batch = dict(batch)
    if cfg.mem == "moco":
        init_batch = {"rgbd": batch["rgbd"][..., :batch["rgbd"].shape[-1]
                                            // 2]}
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               init_batch, n_data=N_DATA, steps_per_epoch=2)
    step = make_contrast_train_step(cfg, model, steps_per_epoch=2)
    return step(state, batch, jax.random.PRNGKey(1))


class TestCMCBank:
    def test_cmc_two_bank_step(self):
        cfg = TrainConfig(modal="CMC", arch="resnet18", mem="bank",
                          nce_k=7, batch_size=4, epochs=2,
                          in_channel_list=(1, 2),
                          compute_dtype="float32")
        rng = np.random.default_rng(0)
        batch = {
            "rgbd": rng.standard_normal((4, 32, 32, 3)).astype(np.float32),
            "index": np.arange(4, dtype=np.int32),
        }
        new_state, metrics = run_one(cfg, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert "nce_loss_12" in metrics and "nce_loss_21" in metrics
        assert new_state.memory.banks.shape[0] == 2


class TestCMCMoCo:
    def test_cmc_moco_step(self):
        cfg = TrainConfig(modal="CMC", arch="resnet18", mem="moco",
                          nce_k=16, batch_size=4, epochs=2,
                          in_channel_list=(1, 2),
                          compute_dtype="float32")
        rng = np.random.default_rng(0)
        batch = {
            # two 3ch crops stacked on channels
            "rgbd": rng.standard_normal((4, 32, 32, 6)).astype(np.float32),
            "index": np.arange(4, dtype=np.int32),
        }
        new_state, metrics = run_one(cfg, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert "nce_acc_12" in metrics
        assert int(new_state.moco.ptr) == 4
        assert new_state.moco.queues.shape[0] == 2


class TestCMCJigsaw:
    """CMCMultiHeads (build_backbone.py:148-184): per-modality jigsaw heads;
    bank logits follow the trainer's swapped-jig-arg convention
    (contrast_trainer.py:447-452)."""

    def _batch(self):
        rng = np.random.default_rng(0)
        return {
            "rgbd": rng.standard_normal((4, 32, 32, 3)).astype(np.float32),
            "rgbd_jig": rng.standard_normal(
                (4, 9, 16, 16, 3)).astype(np.float32),
            "index": np.arange(4, dtype=np.int32),
        }

    def _state(self, cfg, model, batch, moco=False):
        x = batch["rgbd"]
        if moco:  # one 3ch crop for init (step input stacks two on channels)
            x = x[..., :x.shape[-1] // 2]
        state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                   {"rgbd": x}, n_data=N_DATA,
                                   steps_per_epoch=2)
        v = model.init(jax.random.PRNGKey(0), x[:1],
                       train=False,
                       x_jig=batch["rgbd_jig"][:1].reshape(-1, 16, 16, 3),
                       shuffle_ids=jnp.arange(9))
        from hcmoco_tpu.train.state import make_optimizer
        tx, _ = make_optimizer(cfg, 2)
        state = state.replace(params=v["params"],
                              batch_stats=v.get("batch_stats", {}),
                              opt_state=tx.init(v["params"]))
        if moco:
            state = state.replace(params_ema=v["params"])
        return state

    def test_cmc_jigsaw_bank_step(self):
        cfg = TrainConfig(modal="CMC", arch="resnet18", mem="bank",
                          jigsaw=True, beta=0.5, nce_k=7, batch_size=4,
                          epochs=2, in_channel_list=(1, 2),
                          compute_dtype="float32")
        model = build_model(cfg)
        batch = self._batch()
        state = self._state(cfg, model, batch)
        step = make_contrast_train_step(cfg, model, steps_per_epoch=2)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        # 4 logit groups: 12, 21, jig2 (f2_jig vs bank2), jig1
        for n in ("12", "21", "jig2", "jig1"):
            assert f"nce_loss_{n}" in metrics
        # metrics log RAW per-direction losses (reference meter semantics);
        # the optimized total applies (1-b)/b weighting
        b = cfg.beta
        total = ((1 - b) * (float(metrics["nce_loss_12"])
                            + float(metrics["nce_loss_21"]))
                 + b * (float(metrics["nce_loss_jig2"])
                        + float(metrics["nce_loss_jig1"])))
        assert abs(total - float(metrics["loss"])) < 1e-4

    def test_cmc_jigsaw_moco_step(self):
        cfg = TrainConfig(modal="CMC", arch="resnet18", mem="moco",
                          jigsaw=True, beta=0.5, nce_k=16, batch_size=4,
                          epochs=2, in_channel_list=(1, 2),
                          compute_dtype="float32")
        model = build_model(cfg)
        rng = np.random.default_rng(0)
        batch = self._batch()
        batch["rgbd"] = rng.standard_normal(
            (4, 32, 32, 6)).astype(np.float32)  # two crops on channels
        state = self._state(cfg, model, batch, moco=True)
        step = make_contrast_train_step(cfg, model, steps_per_epoch=2)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert "nce_acc_jig2" in metrics and "nce_acc_jig1" in metrics
        assert int(new_state.moco.ptr) == 4


class TestPIRL:
    def test_jigsaw_bank_step(self):
        cfg = resolve_config(TrainConfig(
            method="PIRL", arch="resnet18", nce_k=7, batch_size=4,
            epochs=2, compute_dtype="float32"))
        assert cfg.jigsaw and cfg.mem == "bank"
        model = build_model(cfg)
        rng = np.random.default_rng(0)
        batch = {
            "rgbd": rng.standard_normal((4, 32, 32, 3)).astype(np.float32),
            "rgbd_jig": rng.standard_normal(
                (4, 9, 16, 16, 3)).astype(np.float32),
            "index": np.arange(4, dtype=np.int32),
        }
        state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                   {"rgbd": batch["rgbd"]},
                                   n_data=N_DATA, steps_per_epoch=2)
        # init with jigsaw inputs so head_jig params exist
        v = model.init(jax.random.PRNGKey(0), batch["rgbd"][:1],
                       train=False,
                       x_jig=batch["rgbd_jig"][:1].reshape(-1, 16, 16, 3),
                       shuffle_ids=jnp.arange(9))
        state = state.replace(params=v["params"],
                              batch_stats=v.get("batch_stats", {}),
                              opt_state=None)
        from hcmoco_tpu.train.state import make_optimizer
        tx, _ = make_optimizer(cfg, 2)
        state = state.replace(opt_state=tx.init(state.params))
        step = make_contrast_train_step(cfg, model, steps_per_epoch=2)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert "nce_loss_jig" in metrics


class TestCMCSharedTrunk:
    """Legacy shared-trunk CMC ResNet (resnet_cmc.py) — the groups=2
    split-stem family the reference ships unwired (cmc_model_dict,
    resnet_cmc.py:234-238).  Param goldens extracted once from the torch
    module on CPU: resnet50 11,795,648; resnet101 21,317,824."""

    def test_param_count_matches_reference(self):
        from hcmoco_tpu.models.resnet import make_cmc_resnet

        model = make_cmc_resnet("resnet50", dtype=jnp.float32)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                       train=False)
        n = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(v["params"]))
        assert n == 11_795_648

    def test_modality_towers_never_mix(self):
        """groups=2 everywhere => the first pooled half depends only on the
        L channel, the second only on ab (resnet_cmc.py:154-173)."""
        from hcmoco_tpu.models.resnet import make_cmc_resnet

        model = make_cmc_resnet("resnet50", dtype=jnp.float32)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros_like(x),
                       train=False)
        l1, ab1 = model.apply(v, jnp.asarray(x), train=False)
        x2 = x.copy()
        x2[..., 1:] += 1.0  # perturb ab only
        l2, ab2 = model.apply(v, jnp.asarray(x2), train=False)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
        assert np.abs(np.asarray(ab1) - np.asarray(ab2)).max() > 0

    def test_cmc_shared_bank_step(self):
        cfg = TrainConfig(modal="CMC", arch="resnet50cmc", mem="bank",
                          nce_k=7, batch_size=4, epochs=2,
                          in_channel_list=(1, 2),
                          compute_dtype="float32")
        rng = np.random.default_rng(0)
        batch = {
            "rgbd": rng.standard_normal((4, 32, 32, 3)).astype(np.float32),
            "index": np.arange(4, dtype=np.int32),
        }
        new_state, metrics = run_one(cfg, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert "nce_loss_12" in metrics and "nce_loss_21" in metrics
