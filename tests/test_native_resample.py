"""Byte-exact parity of the native crop+resample core against Pillow.

The packed pipeline's host hot path is `crop_pad` + `Image.resize(size,
BILINEAR/NEAREST)` (data/ntu.py load_raw); resample.cpp must reproduce
Pillow's two-pass fixed-point resampling EXACTLY so swapping it in changes
no pixel anywhere (goldens, loss curves, eval numbers all stay valid).
"""

import numpy as np
import pytest
from PIL import Image

from hcmoco_tpu.native import resample_lib
from hcmoco_tpu.data.transforms import crop_pad

LIB = resample_lib()

pytestmark = pytest.mark.skipif(LIB is None,
                                reason="native resample lib unavailable")


def pil_rgb(frame, i, j, h, w, size, flip):
    img = Image.fromarray(crop_pad(frame, i, j, h, w))
    img = img.resize(size, Image.BILINEAR)
    if flip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    return np.asarray(img, np.uint8)


def pil_depth(frame, i, j, h, w, size, flip):
    img = Image.fromarray(crop_pad(frame, i, j, h, w))
    img = img.resize(size, Image.NEAREST)
    if flip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    return np.asarray(img, np.uint16)


BOXES = [
    # (i, j, h, w) — in-bounds, negative offsets, overhanging, tiny, big
    (10, 20, 200, 300),
    (-30, -10, 250, 180),
    (400, 500, 300, 300),   # overhangs bottom/right
    (0, 0, 480, 640),       # identity box
    (100, 100, 17, 23),     # tiny, upscale
    (-50, 600, 400, 200),   # partial overlap
]


class TestNativeResample:
    @pytest.mark.parametrize("flip", [False, True])
    @pytest.mark.parametrize("box", BOXES)
    def test_rgb_bilinear_exact(self, box, flip):
        rng = np.random.default_rng(0)
        frame = rng.integers(0, 256, (480, 640, 3), np.uint8)
        i, j, h, w = box
        for size in ((320, 320), (64, 96)):
            ref = pil_rgb(frame, i, j, h, w, size, flip)
            got = LIB.resized_crop_u8(frame, i, j, h, w,
                                      (size[1], size[0]), flip)
            np.testing.assert_array_equal(got, ref,
                                          err_msg=f"{box} {size} {flip}")

    @pytest.mark.parametrize("flip", [False, True])
    @pytest.mark.parametrize("box", BOXES)
    def test_depth_nearest_exact(self, box, flip):
        rng = np.random.default_rng(1)
        frame = rng.integers(0, 5000, (480, 640), np.uint16)
        i, j, h, w = box
        for size in ((320, 320), (64, 96)):
            ref = pil_depth(frame, i, j, h, w, size, flip)
            got = LIB.resized_crop_nearest_u16(frame, i, j, h, w,
                                               (size[1], size[0]), flip)
            np.testing.assert_array_equal(got, ref,
                                          err_msg=f"{box} {size} {flip}")

    def test_single_channel_u8(self):
        rng = np.random.default_rng(2)
        frame = rng.integers(0, 256, (100, 120), np.uint8)
        ref = np.asarray(Image.fromarray(
            crop_pad(frame, 5, 5, 60, 70)).resize((32, 48), Image.BILINEAR))
        got = LIB.resized_crop_u8(frame, 5, 5, 60, 70, (48, 32), False)
        np.testing.assert_array_equal(got[..., 0], ref)
