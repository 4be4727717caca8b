"""Generate tests/golden/randaugment_golden.npz: pixel-exact outputs of the
REFERENCE RandAugment ops (/root/reference/pycontrast/datasets/RandAugment.py)
on a fixed synthetic image with pinned arguments (resample pinned to
BILINEAR so geometric ops are deterministic).  tests/test_augment.py checks
our hcmoco_tpu.data.randaugment raw ops reproduce them bit-exactly.

Run from repo root: python tools/gen_randaugment_golden.py
"""

import importlib.util
import os

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_RA = "/root/reference/pycontrast/datasets/RandAugment.py"

spec = importlib.util.spec_from_file_location("ref_randaugment", REF_RA)
ra = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ra)

FILL = (124, 116, 104)
BIL = Image.BILINEAR

img = Image.fromarray(
    np.random.RandomState(42).randint(0, 256, (80, 96, 3), np.uint8))

cases = {
    "rotate_17.3": ra.rotate(img, 17.3, fillcolor=FILL, resample=BIL),
    "shear_x_0.21": ra.shear_x(img, 0.21, fillcolor=FILL, resample=BIL),
    "shear_y_-0.13": ra.shear_y(img, -0.13, fillcolor=FILL, resample=BIL),
    "translate_x_rel_-0.3": ra.translate_x_rel(
        img, -0.3, fillcolor=FILL, resample=BIL),
    "translate_y_rel_0.22": ra.translate_y_rel(
        img, 0.22, fillcolor=FILL, resample=BIL),
    "translate_x_abs_31": ra.translate_x_abs(
        img, 31, fillcolor=FILL, resample=BIL),
    "solarize_128": ra.solarize(img, 128),
    "solarize_add_77": ra.solarize_add(img, 77),
    "posterize_2": ra.posterize(img, 2),
    "equalize": ra.equalize(img),
    "auto_contrast": ra.auto_contrast(img),
    "invert": ra.invert(img),
    "color_1.54": ra.color(img, 1.54),
    "contrast_0.1": ra.contrast(img, 0.1),
    "brightness_1.9": ra.brightness(img, 1.9),
    "sharpness_0.28": ra.sharpness(img, 0.28),
}

out = {"input": np.asarray(img)}
for k, v in cases.items():
    out[k] = np.asarray(v)
path = os.path.join(REPO, "tests", "golden", "randaugment_golden.npz")
np.savez_compressed(path, **out)
print("wrote", path, "with", len(cases), "cases")
