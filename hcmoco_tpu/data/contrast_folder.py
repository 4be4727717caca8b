"""ImageFolder-based contrastive dataset (the InsDis/MoCo/CMC/PIRL baseline
data path).

Behavioral spec: `ImageFolderInstance` (datasets/dataset.py:9-45): returns
(transformed image[, second crop stacked on channels][, jigsaw patches],
index). Two crops for the moco methods, jigsaw stack for PIRL."""

from __future__ import annotations

from typing import Dict

import numpy as np
from PIL import Image

from .image_folder import scan_image_folder
from .augment import build_transform, build_jigsaw_transform


class ContrastImageFolder:
    def __init__(self, root: str, aug: str = "A", modal: str = "RGB",
                 two_crop: bool = False, jigsaw: bool = False,
                 size: int = 224, use_memory_bank: bool = True,
                 seed: int = 0):
        self.samples, self.classes = scan_image_folder(root)
        self.transform = build_transform(aug, modal, use_memory_bank, size,
                                         seed)
        self.jigsaw_transform = (build_jigsaw_transform(modal, seed + 1)
                                 if jigsaw else None)
        self.two_crop = two_crop

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        path, _ = self.samples[index]
        img = Image.open(path).convert("RGB")
        x = self.transform(img)
        if self.two_crop:
            x = np.concatenate([x, self.transform(img)], axis=-1)
        out = {"rgbd": x, "index": np.int32(index)}
        if self.jigsaw_transform is not None:
            out["rgbd_jig"] = self.jigsaw_transform(img)
        return out
