"""A2J depth 3D-pose model: HRNet backbone + anchor heads.

Behavioral spec: `A2J/model.py` — `A2J_HRNet_model` (:191-236): single-
channel depth expanded to 3ch, HRNet multi-res features merged at stride 4
(merge_all_res), then three 4-conv heads (Classification / Regression /
DepthRegression, :7-144) over `num_anchors` anchors per stride-4 cell.

Output layout parity: the reference permutes NCHW->N,W,H,C before
flattening, i.e. anchors are enumerated W-major — matching
`shift_anchors`'s ravel order.  In NHWC we transpose H<->W before the
reshape to keep the same enumeration.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...core.config import HRNET_CONFIGS
from ...models.hrnet import HRNet, merge_all_res

Dtype = Any


class AnchorHead(nn.Module):
    """4x (conv3x3 + BN + ReLU) + conv3x3 output (model.py:7-144)."""

    out_per_anchor: int  # 1 for cls/depth, 2 for xy regression
    num_anchors: int
    num_classes: int
    feature_size: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(4):
            x = nn.Conv(self.feature_size, (3, 3), padding=[(1, 1)] * 2,
                        dtype=self.dtype, name=f"conv{i + 1}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"bn{i + 1}")(x)
            x = nn.relu(x)
        c = self.num_anchors * self.num_classes * self.out_per_anchor
        x = nn.Conv(c, (3, 3), padding=[(1, 1)] * 2, dtype=jnp.float32,
                    name="output")(x)
        b, h, w, _ = x.shape
        # reference flattens W-major: permute to (B, W, H, C) first
        x = jnp.swapaxes(x, 1, 2)
        if self.out_per_anchor == 1:
            x = x.reshape(b, w, h, self.num_anchors, self.num_classes)
            return x.reshape(b, -1, self.num_classes)
        x = x.reshape(b, w, h, self.num_anchors, self.num_classes, 2)
        return x.reshape(b, -1, self.num_classes, 2)


class A2JHRNet(nn.Module):
    num_classes: int = 15
    num_anchors: int = 9  # 3x3 offsets (P_h=P_w=[1,2,3], A2J/main.py:84)
    width: int = 18
    is_3d: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, depth: jnp.ndarray, train: bool = True):
        """depth: (B, H, W) or (B, H, W, 1) mean-normalized depth crop."""
        if depth.ndim == 3:
            depth = depth[..., None]
        x = jnp.repeat(depth.astype(self.dtype), 3, axis=-1)
        feats = HRNet(HRNET_CONFIGS[self.width], dtype=self.dtype,
                      name="Backbone")(x, train)
        merged = merge_all_res(feats)
        cls = AnchorHead(1, self.num_anchors, self.num_classes,
                         dtype=self.dtype,
                         name="classificationModel")(merged, train)
        reg = AnchorHead(2, self.num_anchors, self.num_classes,
                         dtype=self.dtype,
                         name="regressionModel")(merged, train)
        if not self.is_3d:
            return cls, reg
        depth_reg = AnchorHead(1, self.num_anchors, self.num_classes,
                               dtype=self.dtype,
                               name="DepthRegressionModel")(merged, train)
        return cls, reg, depth_reg
