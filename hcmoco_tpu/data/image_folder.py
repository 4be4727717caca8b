"""ImageFolder-style classification dataset for the linear probe.

Reference: torchvision ImageFolder as used by `main_linear.py` /
`ImageFolderInstance` (datasets/dataset.py:9-45): class-per-subdirectory,
standard train augs (RandomResizedCrop+flip) or center-crop eval."""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np
from PIL import Image

from .transforms import normalize_rgb, random_resized_crop_params, \
    resized_crop

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def scan_image_folder(root: str) -> Tuple[List[Tuple[str, int]], List[str]]:
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    samples = []
    for ci, c in enumerate(classes):
        cdir = os.path.join(root, c)
        for dirpath, _, files in sorted(os.walk(cdir)):
            for f in sorted(files):
                if f.lower().endswith(IMG_EXTS):
                    samples.append((os.path.join(dirpath, f), ci))
    return samples, classes


class ImageFolderDataset:
    def __init__(self, root: str, size: int = 224, train: bool = True,
                 seed: int = 0):
        self.samples, self.classes = scan_image_folder(root)
        self.size = size
        self.train = train
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        path, target = self.samples[index]
        img = Image.open(path).convert("RGB")
        if self.train:
            i, j, h, w = random_resized_crop_params(
                self._rng, img.size[1], img.size[0], (0.2, 1.0),
                (3.0 / 4, 4.0 / 3))
            img = resized_crop(img, i, j, h, w, (self.size, self.size))
            if self._rng.random() < 0.5:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
        else:
            # resize short side to size*1.14 then center crop
            ow, oh = img.size
            scale = (self.size * 256 // 224) / min(ow, oh)
            img = img.resize((int(ow * scale), int(oh * scale)),
                             Image.BILINEAR)
            ow, oh = img.size
            left = (ow - self.size) // 2
            top = (oh - self.size) // 2
            img = img.crop((left, top, left + self.size, top + self.size))
        return {"rgbd": normalize_rgb(np.array(img)),
                "label": np.int32(target),
                "index": np.int32(index)}
