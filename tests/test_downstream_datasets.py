"""File-level tests for the downstream parsing datasets over the
Parsing-4K-layout fixture (rgb/ depth/ png_annotation_v2/)."""

import numpy as np
import pytest

from hcmoco_tpu.data.fixtures import make_seg_fixture, make_ntu_fixture
from hcmoco_tpu.downstream.seg.datasets import ParsingDataset


@pytest.fixture(scope="module")
def seg_tree(tmp_path_factory):
    ntu_root = str(tmp_path_factory.mktemp("ntu"))
    make_ntu_fixture(ntu_root, n_frames=1)
    root = str(tmp_path_factory.mktemp("p4k"))
    return make_seg_fixture(root, ntu_root, n_frames=4)


class TestParsingDataset:
    def test_depth_train_sample(self, seg_tree):
        root, lst = seg_tree
        ds = ParsingDataset(root, lst, modality="depth",
                            crop_size=(32, 32), base_size=32,
                            is_train=True, flip=True, multi_scale=True)
        s = ds[0]
        assert s["image"].shape == (32, 32, 3)
        assert s["label"].shape == (32, 32)
        assert s["label"].max() < 60
        # depth replicated x3 and mean-subtracted on valid pixels
        np.testing.assert_array_equal(s["image"][..., 0],
                                      s["image"][..., 1])

    def test_rgb_train_sample(self, seg_tree):
        root, lst = seg_tree
        ds = ParsingDataset(root, lst, modality="rgb",
                            crop_size=(32, 32), base_size=32,
                            is_train=True)
        s = ds[1]
        assert s["image"].shape == (32, 32, 3)
        assert np.isfinite(s["image"]).all()

    def test_val_protocol(self, seg_tree):
        root, lst = seg_tree
        ds = ParsingDataset(root, lst, modality="depth",
                            crop_size=(32, 32), base_size=32,
                            is_train=False)
        s = ds[0]
        # val: image at crop size, labels at 1000x1000 (nturgbd_d.py:209-215)
        assert s["image"].shape == (32, 32, 3)
        assert s["label"].shape == (1000, 1000)

    def test_class_weights_available(self, seg_tree):
        root, lst = seg_tree
        ds = ParsingDataset(root, lst, crop_size=(32, 32))
        assert ds.class_weights.shape == (25,)
