"""Downstream parsing stack tests: criterion golden parity vs reference
torch math, confusion-matrix metrics, label-pair flip swap, sliding-window
inference."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hcmoco_tpu.downstream.seg.criterion import (
    cross_entropy_seg, ohem_cross_entropy, confusion_matrix,
    miou_from_confusion, poly_lr,
)
from hcmoco_tpu.downstream.seg.datasets import (
    swap_label_pairs, label_mapper, mapped_pairs, process_depth,
)
from hcmoco_tpu.downstream.seg.inference import sliding_window_inference
from hcmoco_tpu.downstream.seg.model import SegHRNet

GOLDEN = np.load(os.path.join(os.path.dirname(__file__), "golden",
                              "seg_golden.npz"))


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


class TestCriterionGolden:
    def test_weighted_ce_matches(self):
        # note: torch F.upsample(mode='bilinear') on the score defaults to
        # align_corners=False? It defaults align_corners=None->False since
        # 0.4; jax.image.resize matches half-pixel semantics.
        loss = cross_entropy_seg(nhwc(GOLDEN["score"]),
                                 jnp.asarray(GOLDEN["target"]),
                                 jnp.asarray(GOLDEN["weight"]),
                                 ignore_label=255)
        np.testing.assert_allclose(float(loss), GOLDEN["ce"], rtol=2e-3)

    def test_ohem_matches(self):
        loss = ohem_cross_entropy(nhwc(GOLDEN["score"]),
                                  jnp.asarray(GOLDEN["target"]),
                                  jnp.asarray(GOLDEN["weight"]),
                                  ignore_label=255, thres=0.7, min_kept=50)
        np.testing.assert_allclose(float(loss), GOLDEN["ohem"], rtol=2e-3)


class TestMetrics:
    def test_confusion_and_miou_perfect(self):
        label = jnp.asarray(np.random.default_rng(0).integers(
            0, 5, (2, 8, 8)))
        conf = confusion_matrix(label, label, 5)
        miou, iou = miou_from_confusion(conf)
        np.testing.assert_allclose(float(miou), 1.0)

    def test_ignore_label_excluded(self):
        label = jnp.full((1, 4, 4), 255)
        conf = confusion_matrix(jnp.zeros((1, 4, 4), jnp.int32), label, 5)
        assert int(conf.sum()) == 0

    def test_poly_lr(self):
        np.testing.assert_allclose(float(poly_lr(0.007, 0, 100)), 0.007)
        assert float(poly_lr(0.007, 50, 100)) < 0.007 / 1.5


class TestLabelFlip:
    def test_swap_pairs_involution(self):
        rng = np.random.default_rng(0)
        label = rng.integers(0, 25, (16, 16))
        once = swap_label_pairs(label)
        twice = swap_label_pairs(once)
        np.testing.assert_array_equal(twice, label)

    def test_mapper_known_values(self):
        m = label_mapper()
        assert m[0] == 0 and m[58] == 24
        p = mapped_pairs()
        assert p.shape == (10, 2)

    def test_process_depth_zero_mean_on_valid(self):
        d = np.zeros((8, 8), np.uint16)
        d[2:6, 2:6] = 2000
        x = process_depth(d)
        assert x.shape == (8, 8, 3)
        nz = x != 0
        # valid pixels mean-subtracted; but (x-mean)==0 pixels merge into
        # the zero set, so just check overall mean is ~0 on original mask
        np.testing.assert_allclose(x[2:6, 2:6].mean(), 0.0, atol=1e-4)


class TestSlidingWindow:
    def test_tiles_cover_and_average(self):
        # fake "model": class 0 everywhere with prob p determined by mean
        def apply_fn(x):
            b, h, w, _ = x.shape
            logit = jnp.zeros((b, h // 4, w // 4, 3))
            return logit.at[..., 0].set(5.0)

        img = np.random.default_rng(0).standard_normal(
            (40, 56, 3)).astype(np.float32)
        probs = sliding_window_inference(apply_fn, img, 3,
                                         crop_size=(24, 24),
                                         scales=(1.0,), flip=True,
                                         flip_pairs=np.array([[1, 2]]))
        assert probs.shape == (40, 56, 3)
        assert (probs.argmax(-1) == 0).all()
        # probabilities sum to ~1 everywhere (single scale)
        np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)


class TestSegModel:
    def test_output_shape(self):
        model = SegHRNet(num_classes=25, width=4, dtype=jnp.float32)
        x = jnp.zeros((1, 32, 32, 3))
        v = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(v, x, train=False)
        assert out.shape == (1, 8, 8, 25)
