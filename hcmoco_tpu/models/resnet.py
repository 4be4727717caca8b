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
    dilation: int = 1  # 3x3 conv dilation (A2J legacy layer4, A2J/resnet.py:111)
    dtype: Dtype = jnp.bfloat16
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        width = int(self.features * (self.base_width / 64.0)) * self.groups

        def conv_bn(h, f, k, s, name, groups=1, dilation=1):
            pad = (k // 2) * dilation
            h = nn.Conv(f, (k, k), strides=(s, s),
                        padding=[(pad, pad)] * 2, use_bias=False,
                        kernel_dilation=(dilation, dilation),
                        feature_group_count=groups, dtype=self.dtype,
                        name=f"{name}_conv")(h)
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype,
                                name=f"{name}_bn")(h)

        residual = x
        out = nn.relu(conv_bn(x, width, 1, 1, "c1"))
        out = nn.relu(conv_bn(out, width, 3, self.stride, "c2",
                              groups=self.groups, dilation=self.dilation))
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


class CMCBottleneck(nn.Module):
    """resnet_cmc.py Bottleneck (:69-105): every conv — 1x1s, the 3x3, and
    the downsample — is groups=2, so the 'shared' trunk is really two
    parallel half-width towers whose channels never mix after the stem
    BN; that is what makes the final pooled half-split per-modality."""

    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.bfloat16
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        def conv_bn(h, f, k, s, name):
            h = nn.Conv(f, (k, k), strides=(s, s),
                        padding=[(k // 2, k // 2)] * 2, use_bias=False,
                        feature_group_count=2, dtype=self.dtype,
                        name=f"{name}_conv")(h)
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype,
                                name=f"{name}_bn")(h)

        residual = x
        out = nn.relu(conv_bn(x, self.features, 1, 1, "c1"))
        out = nn.relu(conv_bn(out, self.features, 3, self.stride, "c2"))
        out = conv_bn(out, self.features * self.expansion, 1, 1, "c3")
        if self.downsample:
            residual = conv_bn(x, self.features * self.expansion, 1,
                               self.stride, "ds")
        return nn.relu(out + residual)


class CMCResNet(nn.Module):
    """Legacy CMC shared-trunk ResNet (`pycontrast/networks/resnet_cmc.py`).

    Unlike the live CMC path (two full per-modality encoders,
    build_backbone.py:85-184 → CMCDualModel here), this variant runs ONE
    trunk over both modalities: separate 7x7 stems for the 1-channel (L)
    and 2-channel (ab) inputs (resnet_cmc.py:112-113), concatenated to a
    128-channel map through a shared BN + a groups=2 trunk whose first
    stage starts from inplanes=128 (:111), then the pooled feature is
    split in half — first half L's tower, second ab's (:170-173).
    `width` multiplies the stage widths only; the stems stay 64+64
    (:118).  Exposed sizes mirror cmc_model_dict (:234-238):
    resnet50/101/152.  One maxpool (:161), unlike resnet.py's
    double-maxpool quirk."""

    layers: Tuple[int, ...] = (3, 4, 6, 3)
    width_mult: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = x.astype(self.dtype)
        x1, x2 = x[..., :1], x[..., 1:3]
        h1 = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                     use_bias=False, dtype=self.dtype, name="stem_v1")(x1)
        h2 = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                     use_bias=False, dtype=self.dtype, name="stem_v2")(x2)
        h = jnp.concatenate([h1, h2], axis=-1)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="stem_bn")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

        features = 64 * self.width_mult
        for stage, n_blocks in enumerate(self.layers):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                h = CMCBottleneck(
                    features,
                    stride=stride if b == 0 else 1,
                    downsample=b == 0,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{b}",
                )(h, train)
            features *= 2
        pooled = jnp.mean(h, axis=(1, 2)).astype(jnp.float32)
        half = pooled.shape[-1] // 2
        return pooled[..., :half], pooled[..., half:]


# cmc_model_dict parity (resnet_cmc.py:234-238)
CMC_RESNET_SPECS = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}


def make_cmc_resnet(name: str, dtype: Dtype = jnp.bfloat16) -> CMCResNet:
    base, width = parse_arch(name)
    return CMCResNet(layers=CMC_RESNET_SPECS[base], width_mult=width,
                     dtype=dtype)


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
