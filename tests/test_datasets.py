"""File-level dataset tests over synthetic on-disk fixtures that replicate
the NTU / MPII / COCO / Parsing-4K layouts (SURVEY.md §4 (4))."""

import os

import numpy as np
import pytest

from hcmoco_tpu.data.fixtures import (
    make_ntu_fixture, make_mpii_fixture, make_coco_fixture, make_seg_fixture,
)
from hcmoco_tpu.data.ntu import (
    NTURGBDPairs, NTUSkeleton3D, NTUHeatmap, rgb_to_depth_path,
    rgb_to_skeleton_path,
)
from hcmoco_tpu.data.combined import (
    NTUMPIIGCN, NTUCOCOGCN, NTUSegJoint, seg_label_mapper,
)
from hcmoco_tpu.data.pipeline import (
    mixing_weights, WeightedBatchSampler, DataSource, collate,
)
from hcmoco_tpu.data.transforms import (
    joint_heatmap_rgb, positional_encoding, joint_pairwise_scale,
    normalize_joints, random_resized_crop_params,
)

SIZE = 32


@pytest.fixture(scope="module")
def ntu(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ntu"))
    return make_ntu_fixture(root, n_frames=4)


@pytest.fixture(scope="module")
def mpii(tmp_path_factory):
    return make_mpii_fixture(str(tmp_path_factory.mktemp("mpii")))


@pytest.fixture(scope="module")
def coco(tmp_path_factory):
    return make_coco_fixture(str(tmp_path_factory.mktemp("coco")))


class TestPathTransforms:
    def test_depth_path(self):
        f = "nturgb+d_rgb_warped_correction/S001/WRGB-00000012.jpg"
        assert rgb_to_depth_path(f) == (
            "HumanRGBD/NTURGBD/nturgb+d_depth_masked/S001/"
            "MDepth-00000012.png")

    def test_skeleton_path_is_zero_based(self):
        f = "nturgb+d_rgb_warped_correction/S001/WRGB-00000012.jpg"
        assert rgb_to_skeleton_path(f).endswith("Skeleton-00000011.pkl")


class TestNTUDatasets:
    def test_pairs_item(self, ntu):
        root, lst = ntu
        ds = NTURGBDPairs(root, lst, size=SIZE, random_flip=True,
                          random_resized_crop=True)
        s = ds[0]
        assert s["rgbd"].shape == (SIZE, SIZE, 6)
        # depth channels replicated
        np.testing.assert_array_equal(s["rgbd"][..., 3], s["rgbd"][..., 4])

    def test_skeleton_item(self, ntu):
        root, lst = ntu
        ds = NTUSkeleton3D(root, lst, size=SIZE, random_resized_crop=True)
        s = ds[1]
        assert s["joints3d"].shape == (25, 3)
        np.testing.assert_allclose(s["joints3d"][0], 0.0)  # root-relative

    def test_heatmap_item_channels(self, ntu):
        root, lst = ntu
        ds = NTUHeatmap(root, lst, size=SIZE, random_resized_crop=True)
        s = ds[0]
        assert s["rgbd"].shape == (SIZE, SIZE, 9)


class TestCombinedDatasets:
    def test_ntumpii_both_branches(self, ntu, mpii):
        root, lst = ntu
        ds = NTUMPIIGCN(root, lst, mpii, "train", size=SIZE,
                        random_resized_crop=True)
        mp = ds[0]  # MPII sample
        nt = ds[len(ds.db)]  # first NTU sample
        for s, ud in ((mp, 0), (nt, 1)):
            assert s["rgbd"].shape == (SIZE, SIZE, 6)
            assert s["skeleton"].shape == (16, 2)
            assert s["joints2d"].shape == (16, 2)
            assert int(s["use_depth"]) == ud
        # MPII fake depth is zero with empty mask
        np.testing.assert_allclose(mp["rgbd"][..., 3:], 0.0)
        np.testing.assert_allclose(mp["depth_mask"], 0.0)
        # NTU depth is mean-normalized on the valid mask
        d = nt["rgbd"][..., 3]
        m = nt["depth_mask"] > 0
        if m.sum() > 0:
            np.testing.assert_allclose(d[m].mean(), 0.0, atol=1e-3)
            np.testing.assert_allclose(d[~m], 0.0, atol=1e-6)

    def test_ntucoco_13_joints(self, ntu, coco):
        root, lst = ntu
        ds = NTUCOCOGCN(root, lst, coco, "train2014", size=SIZE,
                        random_resized_crop=True)
        s0 = ds[0]
        s1 = ds[len(ds.db)]
        assert s0["skeleton"].shape == (13, 2)
        assert s1["skeleton"].shape == (13, 2)

    def test_seg_joint(self, ntu, tmp_path_factory):
        root, lst = ntu
        seg_root = str(tmp_path_factory.mktemp("seg"))
        seg_root, seg_lst = make_seg_fixture(seg_root, root)
        ds = NTUSegJoint(root, lst, seg_root, seg_lst, size=SIZE,
                         random_resized_crop=True, skeleton_root=root)
        pre = ds[0]  # NTU pretrain frame
        seg = ds[ds.split]  # first seg frame
        assert int(pre["true_label"]) == 0
        assert (pre["label"] == 255).all()
        assert int(seg["true_label"]) == 1
        # remapped labels land in [0, 25) for the known classes
        lab = seg["label"]
        assert lab.max() < 60
        mapper = seg_label_mapper()
        assert mapper[17] == 7 and mapper[58] == 24

    def test_seg_mask_depth(self, ntu, tmp_path_factory):
        root, lst = ntu
        seg_root = str(tmp_path_factory.mktemp("seg2"))
        seg_root, seg_lst = make_seg_fixture(seg_root, root)
        ds = NTUSegJoint(root, lst, seg_root, seg_lst, size=SIZE,
                         random_resized_crop=True, mask_seg_depth=True,
                         skeleton_root=root)
        seg = ds[ds.split]
        assert int(seg["use_depth"]) == 0
        np.testing.assert_allclose(seg["rgbd"][..., 3:], 0.0)


class TestPipeline:
    def test_mixing_weights(self):
        w = mixing_weights(10, 4, 6)
        np.testing.assert_allclose(w[:4], 0.6)
        np.testing.assert_allclose(w[4:], 0.4)
        # both halves get equal total mass
        np.testing.assert_allclose(w[:4].sum(), w[4:].sum())

    def test_weighted_sampler_balance(self):
        w = mixing_weights(100, 90, 10)
        s = WeightedBatchSampler(w, seed=0)
        draws = np.concatenate([s.draw(512) for _ in range(8)])
        frac_first = (draws < 90).mean()
        assert 0.4 < frac_first < 0.6

    def test_data_source_batches(self, ntu, mpii):
        root, lst = ntu
        ds = NTUMPIIGCN(root, lst, mpii, "train", size=SIZE,
                        random_resized_crop=True)
        w = mixing_weights(len(ds), ds.aux_len, len(ds) - ds.aux_len)
        src = DataSource(ds, batch_size=4, weights=w, num_workers=2)
        it = iter(src)
        b = next(it)
        assert b["rgbd"].shape == (4, SIZE, SIZE, 6)
        assert b["index"].shape == (4,)
        b2 = next(it)
        assert b2["rgbd"].shape == (4, SIZE, SIZE, 6)


class TestTransforms:
    def test_heatmap_peak_at_joint(self):
        joints = np.array([[10.0, 6.0]], np.float32)  # (x, y)
        enc = positional_encoding(1)
        hm = joint_heatmap_rgb(joints, 16, 20, enc)
        peak = np.unravel_index(hm[..., 0].argmax(), hm[..., 0].shape)
        assert peak == (6, 10)  # (row, col)

    def test_scale_fallback(self):
        j = np.zeros((4, 2))
        vis = np.zeros(4, bool)
        assert joint_pairwise_scale(j, vis) == 80.0

    def test_normalize_joints_bounded(self):
        j = np.random.default_rng(0).uniform(0, 100, (16, 2))
        n = normalize_joints(j)
        assert np.abs(n).max() <= 1.0 + 1e-6
        np.testing.assert_allclose(n[6], 0.0)

    def test_crop_params_in_bounds(self):
        rng = np.random.default_rng(0)
        for _ in range(50):
            i, j, h, w = random_resized_crop_params(
                rng, 96, 128, (0.8, 1.2), (0.75, 4.0 / 3))
            assert h > 0 and w > 0
