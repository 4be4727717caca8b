"""Augmentation policy tests (policies A-E, color conversions, jigsaw)."""

import numpy as np
import pytest
from PIL import Image

from hcmoco_tpu.data.augment import (
    build_transform, build_jigsaw_transform, rgb2lab, rgb2ydbdr,
    jigsaw_crop, YDBDR_MEAN, YDBDR_STD,
)
from hcmoco_tpu.data.randaugment import rand_augment_transform


def rand_augment(img, rng, n=2, magnitude=10):
    return rand_augment_transform(f"rand-n{n}-m{magnitude}-mstd0.5")(img, rng)



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


# ---------------------------------------------------------------------------
# full RandAugment op-set parity (tests/golden/randaugment_golden.npz holds
# reference RandAugment.py op outputs; regenerate with
# tools/gen_randaugment_golden.py)
# ---------------------------------------------------------------------------

import os as _os

from PIL import Image as _Image

from hcmoco_tpu.data import randaugment as RA

_RA_GOLDEN = np.load(_os.path.join(_os.path.dirname(__file__), "golden",
                                   "randaugment_golden.npz"))
_FILL = (124, 116, 104)
_BIL = _Image.BILINEAR


class TestRandAugmentOpParity:
    def _img(self):
        return _Image.fromarray(_RA_GOLDEN["input"])

    def _check(self, key, out):
        np.testing.assert_array_equal(np.asarray(out), _RA_GOLDEN[key], key)

    def test_geometric_ops_pixel_exact(self):
        img = self._img()
        self._check("rotate_17.3",
                    RA.rotate(img, 17.3, fill=_FILL, resample=_BIL))
        self._check("shear_x_0.21",
                    RA.shear_x(img, 0.21, fill=_FILL, resample=_BIL))
        self._check("shear_y_-0.13",
                    RA.shear_y(img, -0.13, fill=_FILL, resample=_BIL))
        self._check("translate_x_rel_-0.3",
                    RA.translate_x_rel(img, -0.3, fill=_FILL, resample=_BIL))
        self._check("translate_y_rel_0.22",
                    RA.translate_y_rel(img, 0.22, fill=_FILL, resample=_BIL))
        self._check("translate_x_abs_31",
                    RA.translate_x_abs(img, 31, fill=_FILL, resample=_BIL))

    def test_photometric_ops_pixel_exact(self):
        img = self._img()
        self._check("solarize_128", RA.solarize(img, 128))
        self._check("solarize_add_77", RA.solarize_add(img, 77))
        self._check("posterize_2", RA.posterize(img, 2))
        self._check("equalize", RA.equalize(img))
        self._check("auto_contrast", RA.auto_contrast(img))
        self._check("invert", RA.invert(img))
        self._check("color_1.54", RA.enhance_color(img, 1.54))
        self._check("contrast_0.1", RA.enhance_contrast(img, 0.1))
        self._check("brightness_1.9", RA.enhance_brightness(img, 1.9))
        self._check("sharpness_0.28", RA.enhance_sharpness(img, 0.28))


class TestRandAugmentConfig:
    def test_level_mappings(self):
        rng = np.random.default_rng(0)
        hp = {"translate_const": 100}
        # formulas from RandAugment.py:170-250
        assert abs(RA._lvl_enhance(10, rng, hp)[0] - 1.9) < 1e-12
        assert abs(RA._lvl_enhance(0, rng, hp)[0] - 0.1) < 1e-12
        assert RA._lvl_solarize(10, rng, hp) == (256,)
        assert RA._lvl_solarize_add(10, rng, hp) == (110,)
        assert RA._lvl_posterize_tpu(10, rng, hp) == (4,)
        assert RA._lvl_posterize_original(10, rng, hp) == (8,)
        assert RA._lvl_posterize_research(0, rng, hp) == (4,)
        assert abs(RA._lvl_rotate(5, rng, hp)[0]) == 15.0
        assert abs(RA._lvl_shear(10, rng, hp)[0]) == 0.3
        assert abs(RA._lvl_translate_rel(10, rng, hp)[0]) == 0.45
        assert abs(RA._lvl_translate_abs(5, rng, hp)[0]) == 50.0

    def test_config_string_and_op_sets(self):
        t = RA.rand_augment_transform("rand-n3-m7-mstd0.5")
        assert t.num_layers == 3 and t.magnitude == 7
        assert t.magnitude_std == 0.5
        assert t.transforms == RA.RAND_TRANSFORMS
        assert len(t.transforms) == 15
        c = RA.rand_augment_transform("rand-n2-m10-mstd0.5", use_cmc=True)
        assert c.transforms == RA.RAND_TRANSFORMS_CMC
        # CMC set strips every color-changing op (RandAugment.py:330-340)
        for banned in ("Color", "Contrast", "Brightness", "Solarize",
                       "SolarizeAdd", "PosterizeTpu", "Equalize", "Invert"):
            assert banned not in c.transforms
        w = RA.rand_augment_transform("rand-n2-m10-w0")
        assert w.weights is not None and abs(w.weights.sum() - 1.0) < 1e-12

    def test_apply_runs_all_ops(self):
        img = _Image.fromarray(_RA_GOLDEN["input"])
        rng = np.random.default_rng(1)
        t = RA.rand_augment_transform("rand-n2-m10-mstd0.5")
        for _ in range(40):
            out = t(img, rng)
            assert out.size == img.size
