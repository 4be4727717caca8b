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
from ...models.resnet import ResBottleneck

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


class A2JResNetBackbone(nn.Module):
    """Legacy A2J ResNet50 backbone (A2J/resnet.py:99-161): torchvision
    stem (SINGLE maxpool — unlike pycontrast's double-maxpool quirk),
    layer4 at stride 1 with dilation 2 on its non-first blocks, so layer3
    AND layer4 both sit at stride 16.  Returns (x3, x4) = (1024ch, 2048ch)
    per `ResNetBackBone.forward` (A2J/model.py:155-173)."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

        # (features, n_blocks, stride, dilation-of-later-blocks)
        stages = ((64, 3, 1, 1), (128, 4, 2, 1), (256, 6, 2, 1),
                  (512, 3, 1, 2))
        x3 = None
        for stage, (feats, n_blocks, stride, dil) in enumerate(stages):
            for b in range(n_blocks):
                x = ResBottleneck(
                    feats,
                    stride=stride if b == 0 else 1,
                    downsample=b == 0,
                    # A2J/resnet.py:142-145: the first block of each stage
                    # is built without the dilation kwarg (dilation 1);
                    # later blocks carry the stage dilation
                    dilation=1 if b == 0 else dil,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{b}",
                )(x, train)
            if stage == 2:
                x3 = x
        return x3, x


class A2JResNet(nn.Module):
    """Legacy ResNet50 A2J variant (`A2J_model`, A2J/model.py:177-195).

    HCMoCo's experiments use the HRNet variant; this one is the original
    A2J configuration (main.py:296-300): classification head on layer3
    (1024ch), regression + depth heads on layer4 (2048ch), 16 anchors per
    stride-16 cell (P_h=P_w=None -> the [2,6,10,14]^2 default grid,
    anchor.py:7-25).
    """

    num_classes: int = 15
    num_anchors: int = 16
    is_3d: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, depth: jnp.ndarray, train: bool = True):
        """depth: (B, H, W) or (B, H, W, 1) mean-normalized depth crop."""
        if depth.ndim == 3:
            depth = depth[..., None]
        x = jnp.repeat(depth.astype(self.dtype), 3, axis=-1)
        x3, x4 = A2JResNetBackbone(dtype=self.dtype, name="Backbone")(
            x, train)
        cls = AnchorHead(1, self.num_anchors, self.num_classes,
                         dtype=self.dtype,
                         name="classificationModel")(x3, train)
        reg = AnchorHead(2, self.num_anchors, self.num_classes,
                         dtype=self.dtype,
                         name="regressionModel")(x4, train)
        if not self.is_3d:
            return cls, reg
        depth_reg = AnchorHead(1, self.num_anchors, self.num_classes,
                               dtype=self.dtype,
                               name="DepthRegressionModel")(x4, train)
        return cls, reg, depth_reg
