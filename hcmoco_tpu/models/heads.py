"""Projection heads and task heads.

Reference spec: `Normalize`/`JigsawHead` (pycontrast/networks/util.py:74-124),
linear/mlp heads inside the build_backbone model classes
(build_backbone.py:225-242), FCN seg head (networks/fcn.py:35-111), linear
probe (networks/build_linear.py:17-27), Gaussian joint-pooling blur
(networks/util.py:8-71).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12):
    """torch F.normalize(p=2) semantics: x / max(||x||, eps)."""
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis,
                         keepdims=True))
    return (x / jnp.maximum(n, eps)).astype(x.dtype)


class ProjectionHead(nn.Module):
    """linear (or mlp) projection + L2 norm to the contrastive sphere."""

    feat_dim: int = 128
    head: str = "linear"  # 'linear' | 'mlp'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        if self.head == "linear":
            x = nn.Dense(self.feat_dim, dtype=self.dtype, name="fc")(x)
        elif self.head == "mlp":
            d = x.shape[-1]
            x = nn.Dense(d, dtype=self.dtype, name="fc1")(x)
            x = nn.relu(x)
            x = nn.Dense(self.feat_dim, dtype=self.dtype, name="fc2")(x)
        else:
            raise NotImplementedError(f"head: {self.head}")
        return l2_normalize(x, axis=-1)


class JigsawHead(nn.Module):
    """PIRL jigsaw head (networks/util.py:83-124): per-patch fc, shuffle,
    concat k patches, fc, l2-norm.  The shuffle permutation is passed in
    (RNG is threaded explicitly in JAX)."""

    dim_out: int
    k: int = 9
    head: str = "linear"

    @nn.compact
    def __call__(self, x: jnp.ndarray, shuffle_ids: jnp.ndarray):
        if self.head == "linear":
            x = nn.Dense(self.dim_out, name="fc1")(x)
        else:
            d = x.shape[-1]
            x = nn.Dense(d, name="fc1a")(x)
            x = nn.relu(x)
            x = nn.Dense(self.dim_out, name="fc1b")(x)
        x = x[shuffle_ids]
        n_img = x.shape[0] // self.k
        x = x.reshape(n_img, -1)
        x = nn.Dense(self.dim_out, name="fc2")(x)
        return l2_normalize(x, axis=-1)


class MaskedBatchNorm(nn.Module):
    """BatchNorm whose training statistics can exclude masked-out samples.

    The reference versatility trainer applies its FCN classifier ONLY to the
    `true_label` (labeled) frames (`classifier(max_linear_merge[true_label])`,
    segment_trainer.py:747-769), so the head's torch-BN statistics come from
    the labeled subset.  Under jit that boolean indexing is a dynamic shape;
    instead we run all frames and weight the statistics by `sample_mask`
    (per-sample 0/1), which is the identical math.  Variable layout matches
    nn.BatchNorm (params scale/bias, batch_stats mean/var) so the transfer
    bridge and checkpoints are unchanged.  Running-stat update uses torch
    semantics: momentum as (1-torch_momentum) EMA, UNBIASED batch variance
    (torch BN tracks unbiased var, functional._batch_norm)."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, sample_mask=None):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if not train:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            red = tuple(range(x.ndim - 1))
            if sample_mask is None:
                n = float(np.prod(x.shape[:-1]))
                mean = jnp.mean(xf, axis=red)
                var = jnp.mean(jnp.square(xf - mean), axis=red)
            else:
                w = sample_mask.astype(jnp.float32).reshape(
                    (-1,) + (1,) * (x.ndim - 1))
                n = jnp.maximum(
                    jnp.sum(w) * float(np.prod(x.shape[1:-1])), 1.0)
                mean = jnp.sum(xf * w, axis=red) / n
                var = jnp.sum(jnp.square(xf - mean) * w, axis=red) / n
            if not self.is_initializing():
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * unbiased)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(
            var + self.epsilon) * scale + bias
        return y.astype(self.dtype)


class FCNHead(nn.Module):
    """FCN segmentation head (networks/fcn.py:35-111).

    num_convs ConvModule (conv+BN+ReLU) then 1x1 classifier, bilinearly
    upsampled 4x.  build_segmentor uses in=channels=128, num_convs=1,
    kernel_size=1 (build_linear.py:4-15).  NHWC.

    sample_mask: per-sample 0/1 — training BN statistics exclude masked
    frames, reproducing the reference's classifier-on-labeled-frames-only
    semantics (segment_trainer.py:747-769; see MaskedBatchNorm).
    """

    channels: int
    num_classes: int
    num_convs: int = 1
    kernel_size: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 sample_mask=None) -> jnp.ndarray:
        pad = self.kernel_size // 2
        for i in range(self.num_convs):
            x = nn.Conv(
                self.channels, (self.kernel_size,) * 2,
                padding=[(pad, pad)] * 2, dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            x = MaskedBatchNorm(momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name=f"bn{i}")(
                x, train, sample_mask)
            x = nn.relu(x)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         name="conv_seg")(x)
        b, h, w, c = logits.shape
        return jax.image.resize(
            logits, (b, h * 4, w * 4, c), method="bilinear"
        )


class LinearClassifier(nn.Module):
    """Frozen-feature linear probe (build_linear.py:17-27)."""

    n_class: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.n_class, dtype=jnp.float32, name="fc")(x)


def gaussian_kernel_2d(kernel_size: int, sigma: float) -> np.ndarray:
    """Separable 2D gaussian, normalized to sum 1 (util.py:28-43)."""
    ax = np.arange(kernel_size, dtype=np.float32)
    mean = (kernel_size - 1) / 2.0
    g = np.exp(-(((ax - mean) / sigma) ** 2) / 2.0)
    k = np.outer(g, g)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur_nhwc(x: jnp.ndarray, kernel_size: int = 5,
                       sigma: float = 1.0) -> jnp.ndarray:
    """Depthwise gaussian blur with reflect padding of 2
    (GaussianSmoothing use in `_gaussian_joint_pooling`,
    contrast_trainer.py:725-731). Input NHWC; output same shape."""
    pad = kernel_size // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    k = jnp.asarray(gaussian_kernel_2d(kernel_size, sigma))
    c = x.shape[-1]
    # depthwise conv: kernel (kh, kw, 1, c) with feature_group_count=c
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        xp, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
