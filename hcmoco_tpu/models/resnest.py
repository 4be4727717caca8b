"""ResNeSt (split-attention ResNet) in Flax, NHWC.

Behavioral spec: `pycontrast/networks/resnest.py` — `SplAtConv2d` (:19-85,
radix-2 split attention with r-softmax over the radix axis), the ResNeSt
`Bottleneck` (:96-170, avd average-pool-downsample, deep stem, avg-down
shortcuts), `resnest50/101` configurations (:376-390: radix 2, groups 1,
stem_width 32/64, deep_stem, avg_down, avd)."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class SplAtConv2d(nn.Module):
    """Split-attention conv (radix-softmax gated sum of radix branches)."""

    channels: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    radix: int = 2
    reduction_factor: int = 4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        r, c = self.radix, self.channels
        in_ch = x.shape[-1]
        inter = max(in_ch * r // self.reduction_factor, 32)
        pad = self.kernel // 2
        h = nn.Conv(c * r, (self.kernel,) * 2,
                    strides=(self.stride,) * 2, padding=[(pad, pad)] * 2,
                    feature_group_count=self.groups * r, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        h = _bn(train, self.dtype, "bn0")(h)
        h = nn.relu(h)

        b, hh, ww, _ = h.shape
        split = h.reshape(b, hh, ww, r, c)
        gap = jnp.sum(split, axis=3) if r > 1 else split[..., 0, :]
        gap = jnp.mean(gap, axis=(1, 2))  # (B, C)
        g = nn.Conv(inter, (1, 1), feature_group_count=self.groups,
                    dtype=self.dtype, name="fc1")(gap[:, None, None, :])
        g = _bn(train, self.dtype, "bn1")(g)
        g = nn.relu(g)
        att = nn.Conv(c * r, (1, 1), feature_group_count=self.groups,
                      dtype=self.dtype, name="fc2")(g)  # (B,1,1,C*r)
        att = att.reshape(b, r, c)
        if r > 1:
            att = nn.softmax(att.astype(jnp.float32), axis=1).astype(
                h.dtype)  # rSoftMax over radix
            out = jnp.einsum("bhwrc,brc->bhwc", split, att)
        else:
            att = nn.sigmoid(att)
            out = split[..., 0, :] * att[:, None, None, 0, :]
        return out


class ResNeStBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    radix: int = 2
    cardinality: int = 1
    bottleneck_width: int = 64
    avd: bool = True
    is_first: bool = False
    dtype: Dtype = jnp.bfloat16
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        gw = int(self.planes * (self.bottleneck_width / 64.0)) \
            * self.cardinality
        use_avd = self.avd and (self.stride > 1 or self.is_first)

        out = nn.Conv(gw, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(_bn(train, self.dtype, "bn1")(out))
        if use_avd:
            # avd: stride moves into an avg-pool around the 3x3
            out = nn.avg_pool(out, (3, 3), strides=(self.stride,) * 2,
                              padding=[(1, 1)] * 2)
            conv_stride = 1
        else:
            conv_stride = self.stride
        out = SplAtConv2d(gw, 3, conv_stride, self.cardinality, self.radix,
                          dtype=self.dtype, name="conv2")(out, train)
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = _bn(train, self.dtype, "bn3")(out)

        residual = x
        if self.downsample:
            # avg_down shortcut (resnest.py avg_down=True)
            if self.stride > 1:
                residual = nn.avg_pool(residual, (self.stride,) * 2,
                                       strides=(self.stride,) * 2)
            residual = nn.Conv(self.planes * self.expansion, (1, 1),
                               use_bias=False, dtype=self.dtype,
                               name="ds_conv")(residual)
            residual = _bn(train, self.dtype, "ds_bn")(residual)
        return nn.relu(out + residual)


class ResNeSt(nn.Module):
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    stem_width: int = 32
    in_channel: int = 3
    width_mult: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True, return_fm: bool = False):
        x = x.astype(self.dtype)
        sw = self.stem_width
        # deep stem: 3x 3x3 convs
        for i, (f, s) in enumerate(((sw, 2), (sw, 1), (sw * 2, 1))):
            x = nn.Conv(f, (3, 3), strides=(s, s), padding=[(1, 1)] * 2,
                        use_bias=False, dtype=self.dtype,
                        name=f"stem{i}")(x)
            x = nn.relu(_bn(train, self.dtype, f"stem_bn{i}")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

        planes = 64 * self.width_mult
        for stage, n_blocks in enumerate(self.layers):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                x = ResNeStBottleneck(
                    planes,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0),
                    is_first=(b == 0 and stage == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{b}",
                )(x, train)
            planes *= 2
        if return_fm:
            return x
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))
