"""Augmentation policy tests (policies A-E, color conversions, jigsaw)."""

import numpy as np
import pytest
from PIL import Image

from hcmoco_tpu.data.augment import (
    build_transform, build_jigsaw_transform, rgb2lab, rgb2ydbdr,
    rand_augment, jigsaw_crop, YDBDR_MEAN, YDBDR_STD,
)


@pytest.fixture
def img():
    rng = np.random.default_rng(0)
    return Image.fromarray(
        rng.integers(0, 255, (256, 300, 3), dtype=np.uint8))


class TestColorSpaces:
    def test_ydbdr_range_and_known_values(self):
        white = np.full((1, 1, 3), 255, np.uint8)
        y = rgb2ydbdr(white)
        np.testing.assert_allclose(y[0, 0, 0], 1.0, atol=1e-6)  # Y of white
        np.testing.assert_allclose(y[0, 0, 1:], 0.0, atol=1e-6)

    def test_lab_white_black(self):
        white = np.full((1, 1, 3), 255, np.uint8)
        black = np.zeros((1, 1, 3), np.uint8)
        lw = rgb2lab(white)
        lb = rgb2lab(black)
        np.testing.assert_allclose(lw[0, 0, 0], 100.0, atol=0.01)
        np.testing.assert_allclose(lw[0, 0, 1:], 0.0, atol=0.01)
        np.testing.assert_allclose(lb[0, 0], 0.0, atol=0.01)


class TestPolicies:
    @pytest.mark.parametrize("aug", ["A", "B", "C", "D", "E"])
    def test_policy_shapes(self, img, aug):
        t = build_transform(aug, "RGB", size=64, seed=0)
        out = t(img)
        assert out.shape == (64, 64, 3)
        assert out.dtype == np.float32
        assert np.isfinite(out).all()

    def test_cmc_policy_uses_ydbdr(self, img):
        t = build_transform("C", "CMC", size=64, seed=0)
        out = t(img)
        assert out.shape == (64, 64, 3)
        # YDbDr-normalized values live in a bounded range
        assert np.abs(out).max() < 5.0

    def test_policies_are_stochastic(self, img):
        t = build_transform("A", "RGB", size=64, seed=0)
        a, b = t(img), t(img)
        assert not np.allclose(a, b)


class TestJigsaw:
    def test_jigsaw_crops(self, img):
        rng = np.random.default_rng(0)
        crops = jigsaw_crop(img.resize((255, 255)), rng)
        assert len(crops) == 9
        assert all(c.size == (64, 64) for c in crops)

    def test_jigsaw_transform_stack(self, img):
        t = build_jigsaw_transform("RGB", seed=0)
        out = t(img)
        assert out.shape == (9, 64, 64, 3)


class TestRandAugment:
    def test_applies_without_error(self, img):
        rng = np.random.default_rng(0)
        out = rand_augment(img, rng, n=2, magnitude=10)
        assert out.size == img.size
