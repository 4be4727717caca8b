"""A2J realistic-fixture drive (VERDICT round-1 item 5): train the A2J
ITOP pipeline end-to-end on a tiny ITOP-format fixture — .mat frames +
bndbox pickles through the real ITOPDataset/preprocess_frame path — warm-
started from an exported stage-2 encoder checkpoint, and assert PCK@10cm
improves over the run (A2J/main.py:286-391 train loop, :423-449 eval)."""

import os
import pickle
import re

import numpy as np
import jax
import pytest

from hcmoco_tpu.downstream.a2j import data as a2j_data
from hcmoco_tpu.downstream.a2j.data import (
    make_itop_fixture, ITOPDataset, evaluation_10cm, pixel2world,
    world2pixel)


def test_pixel_world_roundtrip_vs_eval_formula():
    """evaluation_10cm numerics: a 'prediction' equal to the ground-truth
    label (mapped into crop coords through the bbox) must score PCK=1, and
    one displaced by >10cm must score 0."""
    import tempfile

    d = tempfile.mkdtemp()
    _, test_dir, _, bnd_pkl = make_itop_fixture(d, n_train=1, n_test=4)
    bnd = np.asarray(pickle.load(open(bnd_pkl, "rb")))
    ds = ITOPDataset(test_dir, bnd, augment=False)
    preds, worlds, means = [], [], []
    for i in range(len(ds)):
        s = ds[i]
        preds.append(s["label"])  # ground truth in crop coords
        worlds.append(s["keypoints_world"])
        means.append(s["mean"])
    pred = np.stack(preds)
    acc = evaluation_10cm(pred, np.stack(worlds), bnd, np.asarray(means))
    assert acc == 1.0
    # displace columns by the pixel equivalent of ~20cm at 2.5m
    bad = pred.copy()
    bad[:, :, 1] += 0.2 / (0.0035 * 2.5) * a2j_data.CROP_W / (
        bnd[0, 2] - bnd[0, 0])
    acc_bad = evaluation_10cm(bad, np.stack(worlds), bnd, np.asarray(means))
    assert acc_bad < 0.1


@pytest.mark.slow
def test_a2j_fixture_train_improves_pck(tmp_path, capsys, monkeypatch):
    # small crops + gentle augmentation so the tiny run can learn
    monkeypatch.setattr(a2j_data, "CROP_H", 64)
    monkeypatch.setattr(a2j_data, "CROP_W", 64)
    monkeypatch.setattr(a2j_data, "RAND_ROTATE", 15)
    monkeypatch.setattr(a2j_data, "RAND_SCALE", (0.1, 0.95))

    train_dir, test_dir, bnd_train, bnd_test = make_itop_fixture(
        str(tmp_path / "itop"), n_train=32, n_test=12)

    # warm start: export the depth encoder of a tiny stage-2 state through
    # the transfer bridge (the reference's pretrained_pth path,
    # A2J/hrnet/official_hrnet.py:505-515)
    from hcmoco_tpu.export.transfer import export_encoder
    from test_train_step import tiny_cfg, setup

    cfg = tiny_cfg(mem="bank+jointspri3d", linear_feat_map=True,
                   pri3d_num_samples_per_image=8)
    _, _, state, _ = setup(cfg)
    pth = str(tmp_path / "encoder2.pth")
    export_encoder(state, "encoder2", pth)

    from hcmoco_tpu.downstream.a2j.train import main

    main(["--train_dir", train_dir, "--test_dir", test_dir,
          "--bndbox_train", bnd_train, "--bndbox_test", bnd_test,
          "--pretrained_pth", pth, "--width", "4", "--crop", "64",
          "--epochs", "10", "--batch_size", "8", "--learning_rate", "2e-3",
          "--print_freq", "2", "--seed", "0", "--eval_first"])

    out = capsys.readouterr().out
    assert re.search(r"=> loaded \d+ conv tensors", out)
    pcks = [float(m) for m in re.findall(r"PCK@10cm (\d\.\d+)", out)]
    assert len(pcks) == 11, out  # epoch-0 untrained baseline + 10 epochs
    # PCK must improve over the UNTRAINED baseline (round-2 deflake: the
    # old `max(later) > epoch1` compared two noisy trained evals on a
    # 12-frame fixture and was seed-brittle; the epoch-0 eval of the
    # warm-started-but-untrained head is a stable near-zero anchor)
    baseline = pcks[0]
    assert np.mean(pcks[-3:]) > baseline, pcks
    assert max(pcks[1:]) >= 0.15, pcks
