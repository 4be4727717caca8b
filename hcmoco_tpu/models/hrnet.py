"""HRNetV2 backbone in Flax (NHWC, TPU-native).

Behavioral spec: the reference torch implementation at
`pycontrast/networks/official_hrnet/official_hrnet.py` (HighResolutionModule
:105-249, HighResolutionNet :258-474) with the W18/32/48 stage layouts from the
bundled seg YAMLs (`get_hrnet_w{18,32,48}_backbone` :484-503).  Returns the
list of 4 multi-resolution feature maps (strides 4/8/16/32); no classification
head (the reference's is commented out, official_hrnet.py:310-327,444-452).

TPU-first choices: NHWC layout, bf16 compute with fp32 params/BN statistics,
static shapes throughout so XLA can tile every conv onto the MXU, bilinear
fuse upsampling via `jax.image.resize` (align_corners=False semantics,
matching torch's default `F.interpolate(mode='bilinear')`).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import HRNetConfig, HRNetStageSpec

Dtype = Any


def _bn_dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """ones-free channel sum: contract (R,) x (R, C) -> (C,) on the MXU."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bn_train_apply(x, scale, bias, eps):
    """Train-mode BN with BOTH directions' channel reductions as dots.

    Returns (y_f32, mean, var).  The forward sums (ones@x, ones@x*x) and
    the backward sums (ones@dy, ones@dy*xhat) are lax.dot_generals so XLA
    schedules all four on the MXU; everything else is elementwise and
    fuses.  Semantics match flax nn.BatchNorm fast-variance exactly.
    """
    out, _ = _bn_train_fwd(x, scale, bias, eps)
    return out


def _bn_train_fwd(x, scale, bias, eps):
    c = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(-1, c)
    r_rows = xf.shape[0]
    ones = jnp.ones((r_rows,), jnp.float32)
    s1 = _bn_dot(ones, xf)
    s2 = _bn_dot(ones, xf * xf)
    mean = s1 / r_rows
    var = jnp.maximum(0.0, s2 / r_rows - mean * mean)
    rstd = jax.lax.rsqrt(var + eps)
    y = ((x.astype(jnp.float32) - mean) * (rstd * scale) + bias)
    return (y, mean, var), (x, mean, rstd, scale)


def _bn_train_bwd(eps, res, cts):
    x, mean, rstd, scale = res
    dy, dmean_ct, dvar_ct = cts
    c = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(-1, c)
    dyf = dy.astype(jnp.float32).reshape(-1, c)
    r_rows = xf.shape[0]
    ones = jnp.ones((r_rows,), jnp.float32)
    xhat = (xf - mean) * rstd
    dbias = _bn_dot(ones, dyf)
    dscale = _bn_dot(ones, dyf * xhat)
    # dx = rstd*scale*(dy - dbias/R - xhat*dscale/R)
    #      + dmean_ct/R + dvar_ct*2*(x-mean)/R   (mean/var side outputs)
    g = rstd * scale
    dxf = (g * dyf - (g * dbias / r_rows)
           - xhat * (g * dscale / r_rows)
           + dmean_ct / r_rows
           + (2.0 / r_rows) * dvar_ct * (xf - mean))
    dx = dxf.reshape(x.shape).astype(x.dtype)
    return dx, dscale, dbias


_bn_train_apply.defvjp(_bn_train_fwd, _bn_train_bwd)


class MatmulBN(nn.Module):
    """BatchNorm whose batch statistics are MXU matvecs, not reduces.

    Math and variable layout are identical to
    ``nn.BatchNorm(use_fast_variance=True, force_float32_reductions=True)``
    over NHWC with feature axis -1 (params ``scale``/``bias``, batch_stats
    ``mean``/``var`` — checkpoints interchange freely).  The difference is
    purely how the sums over (N, H, W) are expressed: as
    ``ones @ x`` / ``ones @ x*x`` dot_generals so XLA schedules them on the
    MXU.  Motivation (PERF.md "Where the remaining time goes"): under the
    batch-minormost layouts XLA picks for the thin-channel HRNet convs, the
    in-context BN stat reduce runs at ~55 GB/s (cross-lane work) while the
    identical reduction in isolation hits 291-331 GB/s; dot operands are
    read on the native tiled path.  Enabled via HCMOCO_BN_MATMUL=1
    (BENCH_BN_MATMUL=1 in bench.py) — an MFU experiment, default off.
    """

    momentum: float = 0.99
    epsilon: float = 1e-5
    # also route the BACKWARD channel reductions (ones@dy, ones@dy*xhat)
    # through dots via _bn_train_apply's custom VJP (HCMOCO_BN_MATMUL=2)
    custom_vjp: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, use_running_average: bool = False, stats=None):
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (c,))
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (c,))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
            mul = jax.lax.rsqrt(var + self.epsilon) * scale
            y = (x - mean) * mul + bias
            return y.astype(self.dtype)
        if stats is not None:
            # channel sums were accumulated in the producing conv's
            # epilogue (ops/pallas/matmul_bn.py) — no stat read here
            from ..ops.pallas.matmul_bn import bn_apply_stats

            y, mean, var = bn_apply_stats(x, stats[0], stats[1], scale,
                                          bias, self.epsilon)
        elif self.custom_vjp:
            y, mean, var = _bn_train_apply(x, scale, bias, self.epsilon)
        else:
            xf = x.astype(jnp.float32).reshape(-1, c)
            n = xf.shape[0]
            ones = jnp.ones((n,), jnp.float32)
            s1 = _bn_dot(ones, xf)
            s2 = _bn_dot(ones, xf * xf)
            mean = s1 / n
            var = jnp.maximum(0.0, s2 / n - mean * mean)
            mul = jax.lax.rsqrt(var + self.epsilon) * scale
            y = (x - mean) * mul + bias
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * mean
            ra_var.value = m * ra_var.value + (1 - m) * var
        return y.astype(self.dtype)


def _bn_matmul_mode() -> int:
    """0 = flax reduce BN; 1 = dot-stats forward (autodiff backward);
    2 = dot-stats forward + custom-VJP dot backward.

    Default on TPU is mode 2: measured +1.3-1.8% end-to-end on the
    flagship step (361.2/361.7 vs 354.6/357.0 samples/s/chip @bs128, two
    runs each — PERF.md "Flagship MFU experiments"), math-equivalent by
    tests/test_models.py.  Elsewhere (CPU tests) the flax reduce is used.
    """
    try:
        v = os.environ.get("HCMOCO_BN_MATMUL")
        if v is not None:
            return int(v)
        return 2 if jax.default_backend() == "tpu" else 0
    except ValueError:
        return 0


def _cminor_enabled() -> bool:
    return os.environ.get("HCMOCO_CMINOR", "0") == "1"


def _convbn_fuse_enabled() -> bool:
    """HCMOCO_CONVBN_FUSE=1: compute BN channel sums in the epilogue of the
    producing 1x1 conv (ops/pallas/matmul_bn.py) instead of re-reading the
    activation with two stat dots — the traffic-elimination MFU experiment
    (VERDICT r3 item 5).  Off by default until measured."""
    return os.environ.get("HCMOCO_CONVBN_FUSE", "0") == "1"


class _Conv1x1Kernel(nn.Module):
    """Declares the same params/conv/kernel variable nn.Conv would, for the
    fused matmul path (module is named "conv" so checkpoints interchange)."""

    features: int

    @nn.compact
    def __call__(self, cin: int):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (1, 1, cin, self.features), jnp.float32)


def _constrain_cminor(x: jnp.ndarray) -> jnp.ndarray:
    """Pin a NHWC activation to a row-major (C-minormost) device layout.

    MFU experiment (PERF.md): XLA lays the big HRNet activations out
    batch-minormost (batch in the 128-lane dim) — optimal for the
    thin-channel convs but it turns every over-(N,H,W) BN stat reduction
    into cross-lane work measured at ~55 GB/s.  This forces the
    C-in-lanes layout end-to-end so the coupled tradeoff (faster BN vs
    slower convs) can be MEASURED instead of inferred.  HCMOCO_CMINOR=1.
    """
    from jax.experimental.layout import Layout, with_layout_constraint
    return with_layout_constraint(
        x, Layout(major_to_minor=tuple(range(x.ndim))))


def _resize_bilinear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear resize on NHWC, align_corners=False (half-pixel centers)."""
    if x.shape[1] == h and x.shape[2] == w:
        return x
    out = jax.image.resize(
        x.astype(jnp.float32), (x.shape[0], h, w, x.shape[3]), method="bilinear"
    )
    return out.astype(x.dtype)


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    use_relu: bool = False
    bn_momentum: float = 0.99
    dtype: Dtype = jnp.bfloat16
    # MFU experiment (PERF.md round 3): round the conv width up to a
    # multiple of pad_to, with the padded channels zero-masked after
    # BN/ReLU so the real-channel math is unchanged.  Tests whether the
    # measured BN-reduction slowdown (batch-minormost layouts XLA picks
    # for thin-channel convs) lifts when channel counts are lane-friendly.
    pad_to: int = 0

    @nn.compact
    def __call__(self, x, train: bool):
        feats = self.features
        if self.pad_to:
            feats = -(-feats // self.pad_to) * self.pad_to
        from jax.ad_checkpoint import checkpoint_name

        if (_convbn_fuse_enabled() and self.kernel == 1
                and self.stride == 1 and not self.pad_to and train):
            # 1x1 conv == matmul: BN channel sums come out of the conv's
            # epilogue for free instead of two stat-dot re-reads of the
            # activation (ops/pallas/matmul_bn.py docstring has the
            # traffic accounting).  Same param tree as the nn.Conv path.
            from ..ops.pallas.matmul_bn import conv1x1_bn_stats

            kern = _Conv1x1Kernel(feats, name="conv")(x.shape[-1])
            b, h, w, cin = x.shape
            y2d, s1, s2 = conv1x1_bn_stats(
                x.astype(self.dtype).reshape(-1, cin),
                kern.reshape(cin, feats).astype(self.dtype))
            y = y2d.reshape(b, h, w, feats)
            y = checkpoint_name(y, "conv_out")
            y = MatmulBN(momentum=self.bn_momentum, epsilon=1e-5,
                         dtype=self.dtype, name="bn")(
                             y, use_running_average=False, stats=(s1, s2))
            if self.use_relu:
                y = nn.relu(y)
            return y

        x = nn.Conv(
            feats,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.kernel // 2, self.kernel // 2)] * 2,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        # remat anchor: with remat='conv_out' the train step saves ONLY
        # these pre-BN conv outputs for the backward pass and recomputes the
        # cheap BN/ReLU elementwise ops — larger batches without re-running
        # any convolution (cf. CLAUDE.md round-1: full remat recompute lost)
        if _cminor_enabled():
            x = _constrain_cminor(x)
        x = checkpoint_name(x, "conv_out")
        mode = _bn_matmul_mode()
        if mode:
            x = MatmulBN(momentum=self.bn_momentum, epsilon=1e-5,
                         custom_vjp=mode >= 2,
                         dtype=self.dtype, name="bn")(
                             x, use_running_average=not train)
        else:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=1e-5,
                dtype=self.dtype,
                name="bn",
            )(x)
        if self.use_relu:
            x = nn.relu(x)
        if feats != self.features:
            mask = jnp.concatenate([
                jnp.ones((self.features,), x.dtype),
                jnp.zeros((feats - self.features,), x.dtype)])
            x = x * mask
        return x


class BasicBlock(nn.Module):
    """3x3-3x3 residual block (official_hrnet.py:32-61); expansion 1."""

    features: int
    stride: int = 1
    downsample: bool = False
    bn_momentum: float = 0.99
    dtype: Dtype = jnp.bfloat16
    pad_to: int = 0

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = ConvBN(self.features, 3, self.stride, True, self.bn_momentum,
                     self.dtype, self.pad_to, name="cb1")(x, train)
        out = ConvBN(self.features, 3, 1, False, self.bn_momentum,
                     self.dtype, self.pad_to, name="cb2")(out, train)
        if self.downsample:
            residual = ConvBN(self.features, 1, self.stride, False,
                              self.bn_momentum, self.dtype, self.pad_to,
                              name="downsample")(x, train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """1x1-3x3-1x1 residual block (official_hrnet.py:64-102); expansion 4."""

    features: int
    stride: int = 1
    downsample: bool = False
    bn_momentum: float = 0.99
    dtype: Dtype = jnp.bfloat16
    expansion: int = 4
    pad_to: int = 0

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = ConvBN(self.features, 1, 1, True, self.bn_momentum,
                     self.dtype, self.pad_to, name="cb1")(x, train)
        out = ConvBN(self.features, 3, self.stride, True, self.bn_momentum,
                     self.dtype, self.pad_to, name="cb2")(out, train)
        out = ConvBN(self.features * self.expansion, 1, 1, False,
                     self.bn_momentum, self.dtype, self.pad_to,
                     name="cb3")(out, train)
        if self.downsample:
            residual = ConvBN(self.features * self.expansion, 1, self.stride,
                              False, self.bn_momentum, self.dtype,
                              self.pad_to, name="downsample")(x, train)
        return nn.relu(out + residual)


_BLOCKS = {"BASIC": (BasicBlock, 1), "BOTTLENECK": (Bottleneck, 4)}


class HRModule(nn.Module):
    """One HighResolutionModule: per-branch residual blocks + full fusion.

    Fusion (official_hrnet.py:177-249): j>i upsample = 1x1 conv+BN then
    bilinear; j<i downsample = chained stride-2 3x3 conv+BN(+ReLU except the
    last); diagonal identity; SUM-fused then ReLU.
    """

    spec: HRNetStageSpec
    in_channels: Tuple[int, ...]
    multi_scale_output: bool = True
    bn_momentum: float = 0.99
    dtype: Dtype = jnp.bfloat16
    pad_to: int = 0

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool):
        spec = self.spec
        block_cls, expansion = _BLOCKS[spec.block]
        nb = spec.num_branches
        out_ch = [c * expansion for c in spec.num_channels]

        # branches
        ys = []
        for i in range(nb):
            x = xs[i]
            for b in range(spec.num_blocks[i]):
                need_ds = b == 0 and self.in_channels[i] != out_ch[i]
                x = block_cls(
                    spec.num_channels[i],
                    downsample=need_ds,
                    bn_momentum=self.bn_momentum,
                    dtype=self.dtype,
                    pad_to=self.pad_to,
                    name=f"branch{i}_block{b}",
                )(x, train)
            ys.append(x)

        if nb == 1:
            return ys

        # fuse
        n_out = nb if self.multi_scale_output else 1
        fused = []
        for i in range(n_out):
            h, w = ys[i].shape[1], ys[i].shape[2]
            acc = ys[i]
            for j in range(nb):
                if j == i:
                    continue
                if j > i:
                    t = ConvBN(out_ch[i], 1, 1, False, self.bn_momentum,
                               self.dtype, self.pad_to,
                               name=f"fuse{i}_{j}")(ys[j], train)
                    acc = acc + _resize_bilinear(t, h, w)
                else:
                    t = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        t = ConvBN(
                            out_ch[i] if last else out_ch[j],
                            3, 2, not last, self.bn_momentum, self.dtype,
                            self.pad_to, name=f"fuse{i}_{j}_{k}",
                        )(t, train)
                    acc = acc + t
            fused.append(nn.relu(acc))
        return fused


class HRNet(nn.Module):
    """HRNetV2 backbone. Input NHWC; returns 4 feature maps (NHWC)."""

    config: HRNetConfig
    dtype: Dtype = jnp.bfloat16
    pad_to: int = 0  # MFU experiment: lane-friendly zero-padded widths

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        cfg = self.config
        bnm = cfg.bn_momentum
        pad = self.pad_to
        x = x.astype(self.dtype)

        # stem: two stride-2 3x3 convs (official_hrnet.py:265-272)
        x = ConvBN(cfg.stem_channels, 3, 2, True, bnm, self.dtype, pad,
                   name="stem1")(x, train)
        x = ConvBN(cfg.stem_channels, 3, 2, True, bnm, self.dtype, pad,
                   name="stem2")(x, train)

        # stage 1: Bottleneck x4 at 64 -> 256 channels
        s1 = cfg.stage1
        block_cls, expansion = _BLOCKS[s1.block]
        ch = s1.num_channels[0]
        for b in range(s1.num_blocks[0]):
            need_ds = b == 0 and x.shape[-1] != ch * expansion
            x = block_cls(ch, downsample=need_ds, bn_momentum=bnm,
                          dtype=self.dtype, pad_to=pad,
                          name=f"layer1_block{b}")(x, train)
        pre_channels = [ch * expansion]

        xs = [x]
        for si, spec in ((2, cfg.stage2), (3, cfg.stage3), (4, cfg.stage4)):
            block_cls, expansion = _BLOCKS[spec.block]
            cur_channels = [c * expansion for c in spec.num_channels]
            # transition (official_hrnet.py:331-365)
            new_xs = []
            for i in range(spec.num_branches):
                if i < len(pre_channels):
                    if pre_channels[i] != cur_channels[i]:
                        t = ConvBN(cur_channels[i], 3, 1, True, bnm,
                                   self.dtype, pad,
                                   name=f"transition{si - 1}_{i}")(xs[i], train)
                    else:
                        t = xs[i]
                else:
                    t = xs[-1]
                    for j in range(i + 1 - len(pre_channels)):
                        out = (cur_channels[i]
                               if j == i - len(pre_channels) else t.shape[-1])
                        t = ConvBN(out, 3, 2, True, bnm, self.dtype, pad,
                                   name=f"transition{si - 1}_{i}_{j}")(t, train)
                new_xs.append(t)
            xs = new_xs
            in_ch = tuple(cur_channels)
            for m in range(spec.num_modules):
                xs = HRModule(
                    spec, in_ch, multi_scale_output=True, bn_momentum=bnm,
                    dtype=self.dtype, pad_to=pad,
                    name=f"stage{si}_module{m}",
                )(xs, train)
            pre_channels = cur_channels

        return xs


def merge_all_res(feats: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Upsample maps 1-3 to map-0 resolution (bilinear, align_corners=False)
    and concat on channels.  Reference: `merge_all_res`
    (build_backbone.py:247-254)."""
    h, w = feats[0].shape[1], feats[0].shape[2]
    ups = [feats[0]] + [_resize_bilinear(f, h, w) for f in feats[1:]]
    return jnp.concatenate(ups, axis=-1)
