"""Config system tests: method presets, recipes, warmup derivation."""

import numpy as np
import pytest

from hcmoco_tpu.core.config import (
    TrainConfig, METHOD_PRESETS, RECIPES, resolve_config, HRNET_CONFIGS,
    to_dict,
)
from hcmoco_tpu.models.build import build_model


class TestPresets:
    def test_override_dict_values(self):
        # base_options.py:12-22 verbatim
        p = METHOD_PRESETS["CMCJointsPri3DRGBD2S"]
        assert (p.modal, p.jigsaw, p.mem, p.aug, p.head, p.nce_t) == (
            "RGBD2S", False, "bank+jointspri3d", "C", "linear", 0.07)
        p = METHOD_PRESETS["MoCov2"]
        assert (p.mem, p.aug, p.head, p.nce_t) == ("moco", "B", "mlp", 0.2)

    def test_resolve_applies_preset(self):
        cfg = resolve_config(TrainConfig(method="CMCRGBD2S"))
        assert cfg.modal == "RGBD2S" and cfg.mem == "bank"
        assert cfg.aug == "C" and cfg.nce_t == 0.07

    def test_warmup_derivation_large_batch(self):
        cfg = resolve_config(TrainConfig(batch_size=512, cosine=True,
                                         epochs=100))
        assert cfg.warm  # batch > 256 forces warmup (train_options.py:51)


class TestRecipes:
    def test_all_recipes_resolve(self):
        assert len(RECIPES) == 15
        for name, cfg in RECIPES.items():
            assert cfg.modal in ("RGB", "CMC", "RGBD2S"), name
            assert cfg.width in HRNET_CONFIGS or cfg.modal == "RGB", name

    @pytest.mark.parametrize("name", [
        "first_stage/ntumpiirgbd2s_hrnet_w18",
        "second_stage/ntumpiirgbd2s_hrnet_w18",
        "versatility/sup_rgb_test_d",
    ])
    def test_recipe_builds_model(self, name):
        cfg = RECIPES[name]
        model = build_model(cfg)
        assert model is not None

    def test_first_stage_hyperparams(self):
        cfg = RECIPES["first_stage/ntumpiirgbd2s_hrnet_w18"]
        # train_ntumpiirgbd2s_hrnet_w18.sh:16-42
        assert cfg.batch_size == 224
        assert cfg.learning_rate == 0.03
        assert cfg.nce_k == 16384
        assert cfg.cosine and cfg.modality_missing

    def test_second_stage_adds_dense_losses(self):
        cfg = RECIPES["second_stage/ntumpiirgbd2s_hrnet_w18"]
        assert cfg.mem == "bank+jointspri3d"
        assert cfg.linear_feat_map
        assert cfg.pri3d_num_samples_per_image == 400

    def test_versatility_masking(self):
        cfg = RECIPES["versatility/sup_rgb_test_d"]
        assert cfg.supervise_type == 1 and cfg.test_type == 2
        assert cfg.mask_seg_depth and not cfg.mask_seg_rgb

    def test_to_dict_roundtrip(self):
        d = to_dict(RECIPES["mini/rgb_insdis"])
        assert d["method"] == "InsDis" and d["mem"] == "bank"
