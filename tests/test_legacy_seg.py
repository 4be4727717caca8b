"""Legacy HRNet-seg benchmark datasets (cityscapes/lip/pascal_ctx) against
tiny on-the-fly fixtures.  Behavioral spec:
HRNet-Semantic-Segmentation/lib/datasets/{cityscapes,lip,pascal_ctx}.py."""

import os

import numpy as np
import pytest
from PIL import Image

from hcmoco_tpu.downstream.seg.legacy import (
    CITYSCAPES_CLASS_WEIGHTS, CITYSCAPES_ID_TO_TRAIN, LIP_FLIP_PAIRS,
    PASCAL_CTX_MAPPING, CityscapesParsing, LIPParsing, PascalContextParsing,
    cityscapes_convert_label, lip_swap_flip_labels,
    pascal_ctx_class_to_index, pascal_ctx_label_transform)


class TestCityscapesMapping:
    def test_forward_mapping_matches_reference_table(self):
        """cityscapes.py:56-68 — ids 7..33 keep 19 classes, rest ignored."""
        raw = np.arange(34).reshape(2, 17)
        out = cityscapes_convert_label(raw, ignore_label=-1)
        assert out[raw == 7].item() == 0
        assert out[raw == 33].item() == 18
        assert (out[np.isin(raw, [0, 1, 6, 9, 10, 14, 29, 30])] == -1).all()
        assert sorted(out[out >= 0].tolist()) == list(range(19))

    def test_inverse_round_trips(self):
        train = np.arange(19).reshape(1, 19)
        raw = cityscapes_convert_label(train, ignore_label=0, inverse=True)
        back = cityscapes_convert_label(raw, ignore_label=-1)
        np.testing.assert_array_equal(back, train)

    def test_class_weights(self):
        assert CITYSCAPES_CLASS_WEIGHTS.shape == (19,)
        assert abs(CITYSCAPES_CLASS_WEIGHTS[0] - 0.8373) < 1e-6


class TestLIPFlip:
    def test_label_pair_swap(self):
        """lip.py:92-100 — right 15/17/19 <-> left 14/16/18."""
        lab = np.array([[14, 15], [16, 17], [18, 19], [0, 5]])
        out = lip_swap_flip_labels(lab)
        np.testing.assert_array_equal(
            out, np.array([[15, 14], [17, 16], [19, 18], [0, 5]]))
        # involution
        np.testing.assert_array_equal(lip_swap_flip_labels(out), lab)

    def test_flip_pairs_for_inference_tta(self):
        np.testing.assert_array_equal(
            LIP_FLIP_PAIRS, np.array([[14, 15], [16, 17], [18, 19]]))


class TestPascalContext:
    def test_class_to_index_digitize(self):
        """pascal_ctx.py:77-84 with _key = arange (the reference omits it)."""
        ids = np.array([[0, 2, 9], [115, 458, 259]])
        out = pascal_ctx_class_to_index(ids)
        srt = PASCAL_CTX_MAPPING.tolist()
        expect = np.vectorize(srt.index)(ids)
        np.testing.assert_array_equal(out, expect)

    def test_class_to_index_rejects_unknown(self):
        with pytest.raises(AssertionError):
            pascal_ctx_class_to_index(np.array([[1]]))  # 1 not a detail id

    def test_label_transform_59_vs_60(self):
        lab = np.array([[0, 1, 59]])
        np.testing.assert_array_equal(
            pascal_ctx_label_transform(lab, 59), np.array([[-1, 0, 58]]))
        np.testing.assert_array_equal(
            pascal_ctx_label_transform(lab, 60), lab)


def _write_png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


@pytest.fixture()
def seg_root(tmp_path):
    root = str(tmp_path)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)

    # cityscapes: raw-id labels
    lab = rng.choice(list(CITYSCAPES_ID_TO_TRAIN) + [0, 29],
                     (40, 60)).astype(np.uint8)
    _write_png(os.path.join(root, "cityscapes", "leftImg8bit", "a.png"), img)
    _write_png(os.path.join(root, "cityscapes", "gtFine", "a.png"), lab)
    with open(os.path.join(root, "train_cs.lst"), "w") as f:
        f.write("leftImg8bit/a.png gtFine/a.png\n")

    # lip
    lip_lab = rng.integers(0, 20, (40, 60)).astype(np.uint8)
    _write_png(os.path.join(root, "lip", "TrainVal_images", "b.jpg"), img)
    _write_png(os.path.join(root, "lip", "TrainVal_parsing_annotations",
                            "b.png"), lip_lab)
    with open(os.path.join(root, "train_lip.lst"), "w") as f:
        f.write("b.jpg b.png\n")

    # pascal_ctx: index-mode masks (0..59)
    ctx_lab = rng.integers(0, 60, (40, 60)).astype(np.uint8)
    _write_png(os.path.join(root, "pascal_ctx", "JPEGImages", "c.jpg"), img)
    _write_png(os.path.join(root, "pascal_ctx", "masks", "c.png"), ctx_lab)
    with open(os.path.join(root, "train_ctx.lst"), "w") as f:
        f.write("JPEGImages/c.jpg masks/c.png\n")
    return root


class TestLegacyDatasets:
    def test_cityscapes_train_sample(self, seg_root):
        ds = CityscapesParsing(seg_root, "train_cs.lst",
                               crop_size=(24, 32), base_size=48, seed=1)
        assert len(ds) == 1
        s = ds[0]
        assert s["image"].shape == (24, 32, 3)
        assert s["label"].shape == (24, 32)
        assert s["image"].dtype == np.float32
        valid = s["label"][s["label"] != -1]
        assert valid.size == 0 or (0 <= valid).all() and (valid < 19).all()
        np.testing.assert_array_equal(s["size"], [40, 60])

    def test_cityscapes_save_pred_round_trips(self, seg_root, tmp_path):
        ds = CityscapesParsing(seg_root, "train_cs.lst",
                               crop_size=(24, 32), base_size=48)
        pred = np.arange(19, dtype=np.int32).repeat(2).reshape(2, 19)
        sv = str(tmp_path / "preds")
        os.makedirs(sv, exist_ok=True)
        ds.save_pred(pred, sv, "a")
        back = np.array(Image.open(os.path.join(sv, "a.png")))
        np.testing.assert_array_equal(
            cityscapes_convert_label(back.astype(np.int32), -1), pred)

    def test_lip_val_keeps_label_size(self, seg_root):
        ds = LIPParsing(seg_root, "train_lip.lst", crop_size=(24, 24),
                        is_train=False)
        s = ds[0]
        assert s["image"].shape == (24, 24, 3)
        assert s["label"].shape == (40, 60)  # evaluated at original size

    def test_lip_train_sample(self, seg_root):
        ds = LIPParsing(seg_root, "train_lip.lst", crop_size=(24, 24),
                        base_size=24, seed=3)
        s = ds[0]
        assert s["image"].shape == (24, 24, 3)
        assert s["label"].shape == (24, 24)
        assert ((0 <= s["label"]) & (s["label"] < 20)).all() or (
            s["label"] == -1).any()

    def test_pascal_train_and_val(self, seg_root):
        tr = PascalContextParsing(seg_root, "train_ctx.lst",
                                  crop_size=(24, 24), base_size=24, seed=2)
        s = tr[0]
        assert s["image"].shape == (24, 24, 3)
        assert (s["label"] >= -1).all() and (s["label"] < 59).all()
        va = PascalContextParsing(seg_root, "train_ctx.lst",
                                  crop_size=(24, 24), is_train=False)
        v = va[0]
        assert v["label"].shape == (24, 24)


class TestLegacyCLIDrive:
    def test_cityscapes_trains_through_seg_cli(self, seg_root, tmp_path,
                                               capsys):
        """End-to-end: the parsing trainer consumes CityscapesParsing via
        --dataset cityscapes (class weights + 34->19 labels + mIoU eval)."""
        import os

        rng = np.random.default_rng(1)
        img_dir = os.path.join(seg_root, "cityscapes", "leftImg8bit")
        gt_dir = os.path.join(seg_root, "cityscapes", "gtFine")
        names = []
        for i in range(8):
            img = rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)
            lab = rng.choice(list(CITYSCAPES_ID_TO_TRAIN) + [0, 29],
                             (40, 60)).astype(np.uint8)
            _write_png(os.path.join(img_dir, f"d{i}.png"), img)
            _write_png(os.path.join(gt_dir, f"d{i}.png"), lab)
            names.append(f"leftImg8bit/d{i}.png gtFine/d{i}.png")
        with open(os.path.join(seg_root, "cs_train.lst"), "w") as f:
            f.write("\n".join(names))
        with open(os.path.join(seg_root, "cs_val.lst"), "w") as f:
            f.write("\n".join(names))

        from hcmoco_tpu.downstream.seg.train import main

        main(["--root", seg_root, "--train_list", "cs_train.lst",
              "--val_list", "cs_val.lst", "--dataset", "cityscapes",
              "--num_classes", "19", "--crop", "32", "--width", "4",
              "--epochs", "1", "--batch_size", "8", "--max_steps", "1",
              "--print_freq", "1"])
        out = capsys.readouterr().out
        assert "mIoU" in out and "loss" in out
