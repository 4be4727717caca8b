"""ResNet / ResNeXt family in Flax (NHWC).

Reference: `pycontrast/networks/resnet.py` — torchvision-style ResNet with a
`width` multiplier and `in_channel` argument, global-average-pooled output of
dim `2048 * width` (model_dict at resnet.py:424-437).  Used by the
InsDis/MoCo/CMC baselines (RGBSingleHead/CMCSingleHead,
build_backbone.py:14-184).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ResBottleneck(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dtype: Dtype = jnp.bfloat16
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        width = int(self.features * (self.base_width / 64.0)) * self.groups

        def conv_bn(h, f, k, s, name, groups=1):
            h = nn.Conv(f, (k, k), strides=(s, s),
                        padding=[(k // 2, k // 2)] * 2, use_bias=False,
                        feature_group_count=groups, dtype=self.dtype,
                        name=f"{name}_conv")(h)
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype,
                                name=f"{name}_bn")(h)

        residual = x
        out = nn.relu(conv_bn(x, width, 1, 1, "c1"))
        out = nn.relu(conv_bn(out, width, 3, self.stride, "c2",
                              groups=self.groups))
        out = conv_bn(out, self.features * self.expansion, 1, 1, "c3")
        if self.downsample:
            residual = conv_bn(x, self.features * self.expansion, 1,
                               self.stride, "ds")
        return nn.relu(out + residual)


class ResNet(nn.Module):
    """ResNet-v1 backbone returning the pooled (B, 2048*width_mult) feature,
    or the pre-pool feature map when return_fm=True."""

    layers: Tuple[int, ...] = (3, 4, 6, 3)
    width_mult: int = 1
    in_channel: int = 3
    groups: int = 1
    base_width: int = 64
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True, return_fm: bool = False):
        x = x.astype(self.dtype)
        base = 64 * self.width_mult
        x = nn.Conv(base, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        # the reference forward applies maxpool TWICE (resnet.py:215-219 —
        # `x = self.maxpool(x)` on consecutive lines), giving /8 resolution
        # before layer1.  Preserved for checkpoint/parity compatibility.
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

        features = base
        for stage, n_blocks in enumerate(self.layers):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                need_ds = b == 0
                x = ResBottleneck(
                    features,
                    stride=stride if b == 0 else 1,
                    downsample=need_ds,
                    groups=self.groups,
                    base_width=self.base_width,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{b}",
                )(x, train)
            features *= 2
        if return_fm:
            return x
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)


# model_dict parity (resnet.py:424-437) — name -> constructor kwargs
RESNET_SPECS = {
    "resnet18": dict(layers=(2, 2, 2, 2)),
    "resnet34": dict(layers=(3, 4, 6, 3)),
    "resnet50": dict(layers=(3, 4, 6, 3)),
    "resnet101": dict(layers=(3, 4, 23, 3)),
    "resnet152": dict(layers=(3, 8, 36, 3)),
    "resnext50": dict(layers=(3, 4, 6, 3), groups=32, base_width=4),
    "resnext101": dict(layers=(3, 4, 23, 3), groups=32, base_width=8),
    "resnext152": dict(layers=(3, 8, 36, 3), groups=32, base_width=4),
}


def parse_arch(name: str) -> Tuple[str, int]:
    """'resnet50x2' -> ('resnet50', 2); mirrors _parse_width
    (build_backbone.py:40-47)."""
    if name.endswith("x4"):
        return name[:-2], 4
    if name.endswith("x2"):
        return name[:-2], 2
    return name, 1


def make_resnet(name: str, in_channel: int = 3,
                dtype: Dtype = jnp.bfloat16):
    base, width = parse_arch(name)
    if base.startswith("resnest"):
        from .resnest import ResNeSt

        layers = {"resnest50": (3, 4, 6, 3),
                  "resnest101": (3, 4, 23, 3)}[base]
        stem = 32 if base == "resnest50" else 64
        return ResNeSt(layers=layers, stem_width=stem,
                       in_channel=in_channel, width_mult=width,
                       dtype=dtype)
    spec = RESNET_SPECS[base]
    return ResNet(in_channel=in_channel, width_mult=width, dtype=dtype,
                  **spec)
