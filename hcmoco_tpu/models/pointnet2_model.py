"""PointNet++ MSG encoder + the depth-as-point-cloud HCMoCo variant.

Behavioral spec:
  * `Pointnet2MSG` (pycontrast/networks/pointnet2_msg.py:10-95): 4 SA-MSG
    levels (npoints 4096/1024/256/64, dual radii/nsamples, shared MLPs, max
    pool) + 4 FP levels; returns per-point 128-d features.
  * `PointnetSAModuleMSG` / `PointnetFPModule`
    (pointnet2/pointnet2_modules.py:58-156) and `QueryAndGroup`
    (pointnet2_utils.py:231-275): grouped xyz are centred on the centroid
    and concatenated before the MLP (use_xyz=True).
  * `CMC3HRNetSGCNPN2SingleHead` (build_backbone.py:305-514): encoder2 is
    the point cloud branch; `depth2pts` back-projects valid-depth pixels to
    world XYZ with intrinsics x=(u-H/2)*z*0.0035 and multinomially samples
    4096 of them (:379-446); `pts2depth` scatters per-point features back to
    the pixel grid via three_nn inverse-distance interpolation (:448-455).

TPU layout: channels-LAST everywhere ((B, N, C) points); the SA "shared
MLP" is a Dense over the channel axis — XLA maps it onto the MXU as a
(B*M*S, C) matmul.  FPS/ball-query use the Pallas kernels on TPU.
Point sampling randomness is threaded via the 'points' rng collection.
"""

from __future__ import annotations

import os
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import HRNET_CONFIGS
from ..ops.point_ops import (
    furthest_point_sample, ball_query, gather_points,
    three_nn, three_interpolate, interpolation_weights,
)
from ..ops.pallas.window_group import window_group
from .hrnet import (HRNet, MatmulBN, _bn_matmul_mode, merge_all_res,
                    _resize_bilinear)
from .sgcn import SemGCN
from .heads import ProjectionHead

Dtype = Any

# architecture constants (pointnet2_msg.py:10-17)
NPOINTS = (4096, 1024, 256, 64)
RADIUS = ((0.025, 0.125), (0.125, 0.25), (0.25, 0.5), (0.5, 1.0))
NSAMPLE = ((16, 32), (16, 32), (16, 32), (16, 32))
MLPS = (((16, 32), (32, 64)), ((64, 128), (64, 128)),
        ((128, 256), (128, 256)), ((256, 512), (256, 512)))
FP_MLPS = ((128, 128), (256, 256), (512, 512), (512, 512))
# half-windows (KNOWN-table rows) for the windowed weighted-interpolate
# kernel, per FP level, sized against the BENCH operating shape (b=64,
# crop 320, n_data=8192) over 8 depth2pts sampling keys
# (tools/measure_fp_window.py: valid-cloud maxima 663/228/81/23).  The
# original 2x-of-3-seed-b4 windows (512/256/128/64) were violated by the
# b=64 tail at FP0 in 2/8 keys — ONE bad sample trips the whole-batch
# exactness cond, so the kernel silently never engaged e2e (round-4
# xplane evidence: zero windowed_interp custom-calls under
# HCMOCO_FP_WINDOW=1 while the XLA FP scatter fusions kept their full
# default-profile self-times).  Zero clouds (loss-masked invalid
# samples) collapse their 3-NN indices to ~0 and their FP tables are
# NOT row-uniform below fp3 (SA bias/BN break uniformity), so they
# would trip the cond at FP0/FP1 on every real batch — the model passes
# the depth2pts validity mask as `sample_ok` to exempt them (round-5
# A/B: 151.4 vs 132.1 samples/s/chip @bs64).  Any VALID sample
# out-of-window still falls back to the exact XLA path automatically,
# costing ~25 ms for that step only.
FP_WINDOWS = (1024, 384, 192, 64)
# half-windows (table rows) for the windowed one-hot grouping kernel
# AND the windowed ball query, per SA level x scale.  Round-5 sizing:
# tools/measure_sa_window.py computed the exact per-sample REQUIRED
# half-window of both consumers at the bench shape (b=64, crop 320,
# n_data=8192, 8 keys) — maxima 62/320, 391/738, 147/268, 0/0 — and the
# whole-batch trip rate at candidate windows.  Each window is the
# smallest candidate with 0/8 trips and >=1.15x margin over the
# measured max (sa1.1 keeps 896: 768 would be 1.04x over 738).  sa3's
# windows are moot (TW >= N at every candidate; both kernels run
# unwindowed there).  Out-of-window batches fall back to the exact XLA
# gather automatically, so tighter windows trade occasional fallback
# steps for a shorter sweep on every step (cost is linear in
# TW = tile + 2W).  e2e A/B at bs64: see PERF.md "SA window margin".
SA_WINDOWS = ((128, 384), (512, 896), (256, 384), (256, 256))


class SharedMLP(nn.Module):
    """Dense+BN+ReLU stack over the channel (last) axis — the 1x1-conv
    'SharedMLP' of pytorch_utils.py.

    Project-then-group mode (gidx given): x is the per-point TABLE
    (B, N, Cc) = concat(xyz, feats) and the first Dense commutes with the
    neighbor gather,

        W^T @ (concat(xyz[k] - center_m, feats[k]))
          = (table @ W)[k] - (concat(center_m, 0) @ W),

    so layer 0 runs on the N table rows (48x fewer rows than the M*S
    grouped positions at the reference SA-MSG shapes) and the gather moves
    F0-wide projected rows instead of (3+C)-wide raw rows — in particular
    the level-0 xyz gather widens from 12-byte rows (1 GB/s effective on
    TPU HBM, tools/microbench_qgroup.py) to F0*4 bytes.  BN then sees the
    identical values it would have seen post-group, so the math (incl.
    sync-BN statistics) is unchanged — pinned by
    tests/test_pointnet2_model.py::test_project_then_group_equivalence."""

    features: Sequence[int]
    window: int = 0  # >0: windowed one-hot grouping kernel (TPU)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, gidx=None, center=None):
        for i, f in enumerate(self.features):
            dense = nn.Dense(f, use_bias=False, dtype=self.dtype,
                             name=f"dense{i}")
            if i == 0 and gidx is not None:
                p = dense(x)  # (B, N, F0) projected table
                b, m, s = gidx.shape
                if (self.window
                        and os.environ.get("HCMOCO_PN_NO_WG", "0") != "1"):
                    # HCMOCO_PN_FORCE_WG=1: interpret-mode kernel off-TPU
                    # (model-level integration tests)
                    h = window_group(
                        p, gidx, window=self.window,
                        force=os.environ.get("HCMOCO_PN_FORCE_WG") == "1")
                else:
                    h = jnp.take_along_axis(
                        p, gidx.reshape(b, m * s, 1).astype(jnp.int32),
                        axis=1).reshape(b, m, s, f)
                if center is not None:
                    # centering contribution: concat(center, 0) @ W
                    cpad = jnp.concatenate(
                        [center, jnp.zeros(center.shape[:-1]
                                           + (x.shape[-1] - 3,), x.dtype)],
                        axis=-1)
                    h = h - dense(cpad)[:, :, None, :]
                x = h
            else:
                x = dense(x)
            mode = _bn_matmul_mode()
            if mode:  # MXU-matvec BN stats (PERF.md MFU experiment)
                x = MatmulBN(momentum=0.9, epsilon=1e-5,
                             custom_vjp=mode >= 2, dtype=self.dtype,
                             name=f"bn{i}")(x, use_running_average=not train)
            else:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class SAModuleMSG(nn.Module):
    """Set-abstraction with multi-scale grouping."""

    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    point_impl: str = "xla"
    # remat the per-scale MLP: the (B, M, S, F) grouped intermediates are
    # the largest tensors in the whole HRNetPN step (1 GB at sa0/bs64
    # fp32); max-over-S reduces them to (B, M, F) immediately, so
    # recomputing gather + MLP in the backward trades FLOPs for the
    # dominant HBM residency.  Measured on TPU: full remat cost more than
    # it saved (50 vs 69 samples/s) — bf16 MLPs restore the fit without
    # it, so default OFF (bench knob BENCH_PN_REMAT).
    remat_mlp: bool = False
    # per-scale half-windows for the windowed grouping kernel (0 = off)
    windows: Sequence[int] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, features, train: bool):
        # xyz: (B, N, 3); features: (B, N, C) or None
        # allow_identity: SA consumers (gather + per-row grouping/MLPs +
        # coordinate-based 3-NN interpolation) are permutation-equivariant,
        # so the npoint==n case (SA0) can skip the O(N^2) FPS pass.
        idx = furthest_point_sample(xyz, self.npoint, impl=self.point_impl,
                                    allow_identity=True)
        if os.environ.get("HCMOCO_PN_NOSORT", "0") != "1":
            # ascending center order: same FPS-selected SET (consumers are
            # permutation-equivariant, like the raster-sorted sampling in
            # depth2pts), and center table positions become near-linear in
            # m — the property the windowed grouping kernel tiles on.
            idx = jnp.sort(idx, axis=-1)
        new_xyz = gather_points(xyz, idx)  # (B, M, 3)

        # project-then-group: the MLP's first Dense commutes with the
        # neighbor gather (see SharedMLP docstring), so layer 0 runs once
        # on the N-point table and only F0-wide projected rows are gathered
        if features is None:
            table = xyz.astype(jnp.float32)
            center = new_xyz
        elif self.use_xyz:
            table = jnp.concatenate(
                [xyz.astype(features.dtype), features], axis=-1)
            center = new_xyz
        else:
            table = features  # QueryAndGroup use_xyz=False: features only
            center = None
        outs = []
        for i, (r, s) in enumerate(zip(self.radii, self.nsamples)):
            # same measured locality windows the grouping kernel tiles on;
            # exact (violation fallback inside ball_query_windowed).
            # Default ON since measured on-chip (round 4): bench 116.5 vs
            # 111.7 samples/s/chip @bs64 (+4.3%), exact at all SA shapes
            # (tools/check_window_group_tpu.py). HCMOCO_BQ_WINDOW=0 opts
            # back into the full-range sweep.
            bq_win = (self.windows[i] if i < len(self.windows) else 0) \
                if os.environ.get("HCMOCO_BQ_WINDOW", "1") == "1" else 0
            gidx = ball_query(xyz, new_xyz, r, s, impl=self.point_impl,
                              window=bq_win)

            def scale(mlp, table, gidx, center):
                h = mlp(table, train, gidx=gidx, center=center)
                return jnp.max(h, axis=2)  # max over the sample axis

            if self.remat_mlp:
                scale = nn.remat(scale, static_argnums=())
            win = self.windows[i] if i < len(self.windows) else 0
            outs.append(scale(
                SharedMLP(self.mlps[i], window=win, dtype=self.dtype,
                          name=f"mlp{i}"),
                table, gidx, center))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class FPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance interpolation + MLP."""

    mlp: Sequence[int]
    point_impl: str = "xla"
    # half-window (known-table rows) for the windowed weighted-interpolate
    # kernel (0 = plain XLA gather); see FP_WINDOWS
    window: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats,
                 train: bool, sample_ok=None):
        dist2, idx = three_nn(unknown, known, impl=self.point_impl)
        weight = interpolation_weights(dist2)
        # default ON since the round-5 close-out A/B (PERF.md): full
        # Pallas fwd+bwd = 132.1 vs 129.5 samples/s/chip @bs64 (2 runs
        # each) with the bench-shape-sized FP_WINDOWS engaging 20/20
        # steps on-chip.  (The round-4 "-1%" reading measured PERMANENT
        # FALLBACK from under-sized windows, not the kernel.)
        # `sample_ok` (the depth2pts cloud-validity mask) exempts
        # loss-masked zero clouds from the kernel's exactness cond —
        # without it their collapsed 3-NN indices trip the cond at
        # FP0/FP1 on every real batch (round-5: 151.4 vs 132.1
        # samples/s/chip @bs64, +14.6%).
        # HCMOCO_FP_WINDOW=0 restores the XLA gather/scatter path;
        # =fwd keeps the Pallas forward with an XLA scatter backward.
        fp_env = os.environ.get("HCMOCO_FP_WINDOW", "1")
        fp_win = self.window if fp_env in ("1", "fwd") else 0
        interp = three_interpolate(
            known_feats, idx, weight, window=fp_win,
            force_window=os.environ.get("HCMOCO_PN_FORCE_WG") == "1",
            window_bwd="xla" if fp_env == "fwd" else "kernel",
            sample_ok=sample_ok)
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return SharedMLP(self.mlp, dtype=self.dtype, name="mlp")(
            interp, train)


class Pointnet2MSG(nn.Module):
    """(B, N, 3[+C]) -> (B, N, 128) per-point features."""

    input_channels: int = 0
    npoints: Tuple[int, ...] = NPOINTS  # override for small-scale tests
    point_impl: str = "xla"
    # SA levels whose MLPs remat (footprint/recompute ratio is high only
    # for the early levels: sa0/sa1 carry the GB-scale grouped tensors but
    # 16-128-wide MLPs; sa2/sa3 recompute cost 256-512-wide matmuls for
    # little memory -- full remat measured 50 vs 69 samples/s at bs64)
    remat_levels: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pointcloud, train: bool = True, sample_ok=None):
        # sample_ok (B,) bool: per-sample cloud validity (depth2pts);
        # threaded into the FP interpolation cond — see FPModule
        xyz = pointcloud[..., :3]
        feats = pointcloud[..., 3:] if pointcloud.shape[-1] > 3 else None

        l_xyz, l_feats = [xyz], [feats]
        for k in range(len(self.npoints)):
            sa = SAModuleMSG(
                npoint=self.npoints[k], radii=RADIUS[k],
                nsamples=NSAMPLE[k],
                mlps=MLPS[k], point_impl=self.point_impl,
                remat_mlp=k in self.remat_levels,
                windows=SA_WINDOWS[k], dtype=self.dtype,
                name=f"sa{k}")
            nx, nf = sa(l_xyz[k], l_feats[k], train)
            l_xyz.append(nx)
            l_feats.append(nf)

        for i in range(len(FP_MLPS) - 1, -1, -1):
            fp = FPModule(FP_MLPS[i], point_impl=self.point_impl,
                          window=FP_WINDOWS[i], dtype=self.dtype,
                          name=f"fp{i}")
            l_feats[i] = fp(l_xyz[i], l_xyz[i + 1], l_feats[i],
                            l_feats[i + 1], train, sample_ok=sample_ok)
        return l_feats[0]


def _blocked_searchsorted(cdf: jnp.ndarray, u: jnp.ndarray,
                          block: int = 128) -> jnp.ndarray:
    """Exact two-level searchsorted(cdf, u, side='right') per batch row.

    XLA lowers the flat vmapped searchsorted over the 102400-entry cdf as
    a 17-iteration binary search whose every iteration gathers 4 B per
    query from the full row — 45 ms/step at bs64 (the #1 single op of the
    round-4 HRNetPN profile).  Blocked: (A) searchsorted over the 800
    block-LAST values (3 KB — cache/VMEM resident, 10 cheap iterations),
    then (B) one take_along_axis of each query's 128-lane block (512 B
    contiguous rows — the gather width that's fast on TPU HBM) and a
    vectorized compare-count.  Identity: searchsorted-right == count of
    entries <= u; a block whose last value is <= u contributes all
    `block` entries (cdf monotone), the first block with last > u
    contributes its in-block count.  Bit-identical to jnp.searchsorted
    for every u (tests/test_pointnet2_model.py::test_blocked_searchsorted).
    """
    b, n = cdf.shape
    if n % block:
        return jax.vmap(
            lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    nb = n // block
    cblk = cdf.reshape(b, nb, block)
    blast = cblk[:, :, -1]  # (B, NB) block-last values, monotone
    if os.environ.get("HCMOCO_SS_COARSE", "count") == "count":
        # searchsorted(side='right') == #{k: blast[k] <= u} by definition;
        # at NB=800 the fused broadcast compare-count (B*Q*NB ~ 210M VPU
        # ops, reduced along the minor dim so the (B, Q, NB) bools never
        # hit HBM) beats XLA's 10-iteration binary search, whose every
        # iteration is a 4 B random gather per query (26.6 ms/step of the
        # round-4 profile lived in that loop). HCMOCO_SS_COARSE=binary
        # restores the searchsorted lowering for A/B.
        idx_a = jnp.sum(
            (blast[:, None, :] <= u[..., None]).astype(jnp.int32), axis=-1)
    else:
        idx_a = jax.vmap(
            lambda c, uu: jnp.searchsorted(c, uu, side="right"))(blast, u)
    idx_a = jnp.minimum(idx_a, nb - 1)  # u beyond the last block counts in it
    rows = jnp.take_along_axis(cblk, idx_a[..., None], axis=1)  # (B, Q, blk)
    cnt = jnp.sum((rows <= u[..., None]).astype(jnp.int32), axis=-1)
    return idx_a * block + cnt


def depth2pts(depth: jnp.ndarray, depth_mask: jnp.ndarray,
              grid_xy: jnp.ndarray, ori_h: float, ori_w: float,
              mean: jnp.ndarray, rng: jax.Array,
              n_points: int = 4096):
    """Back-project + sample the depth point cloud
    (build_backbone.py:379-446).

    depth: (B, H, W) mean-subtracted depth; grid_xy: (B, H, W, 2) original
    pixel coords tracked through the crop; mean: (B,) per-sample depth mean.
    Returns (sampled_pts (B, n, 3), all_pts (B, H*W, 3), sample_ind,
    valid (B,) bool — True where the image has any valid depth pixel).
    Images with no valid depth yield all-zero points (reference zero-fills
    via the mask scatter, :408-446).
    """
    b, h, w = depth.shape
    z_abs = depth + mean[:, None, None]
    gx = grid_xy[..., 0].astype(jnp.float32)
    gy = grid_xy[..., 1].astype(jnp.float32)
    world_x = (gx - ori_h / 2.0) * z_abs * 0.0035
    world_y = (ori_w / 2.0 - gy) * z_abs * 0.0035
    world_z = depth
    pts = jnp.stack([world_x, world_y, world_z], axis=-1).reshape(b, h * w, 3)

    mask = jax.image.resize(depth_mask.astype(jnp.float32), (b, h, w),
                            method="nearest").reshape(b, h * w)
    valid = mask.sum(-1) > 0
    # uniform-over-valid-pixels WITH replacement (multinomial,
    # build_backbone.py:427) via inverse-CDF: cumsum + searchsorted.  The
    # equivalent jax.random.categorical over h*w=102400 logits cost 631
    # ms/step at bs64 (27% of the HRNetPN step — PERF.md); this is the
    # same distribution for a few ms.
    cdf = jnp.cumsum(mask, axis=-1)  # (b, hw); steps of 1 at valid pixels
    total = cdf[:, -1]
    u = jax.random.uniform(rng, (b, n_points)) * jnp.maximum(total, 1.0)[:, None]
    # sorting the uniforms makes sample_ind raster-ordered FOR FREE (the
    # multiset of draws — hence the multinomial distribution — is
    # unchanged; only the order is).  Raster order = image-space locality
    # = 3D locality for a depth cloud, so every downstream ball-query
    # neighbor gather / backward scatter hits near-contiguous table rows
    # (HBM sector reuse) instead of random ones.  All consumers are
    # permutation-equivariant (the PN encoder + coordinate-based 3-NN).
    # HCMOCO_PN_NOSORT=1 restores draw order for A/B measurement.
    if os.environ.get("HCMOCO_PN_NOSORT", "0") != "1":
        u = jnp.sort(u, axis=-1)
    if os.environ.get("HCMOCO_SS_BLOCKED", "1") == "1":
        # exact blocked reformulation (same values for every u; see
        # _blocked_searchsorted) — A/B knob HCMOCO_SS_BLOCKED=0
        sample_ind = _blocked_searchsorted(cdf, u)
    else:
        sample_ind = jax.vmap(
            lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    sample_ind = jnp.clip(sample_ind, 0, h * w - 1).astype(jnp.int32)
    sampled = jnp.take_along_axis(pts, sample_ind[..., None], axis=1)
    zero = jnp.zeros_like(sampled)
    sampled = jnp.where(valid[:, None, None], sampled, zero)
    pts = jnp.where(valid[:, None, None], pts,
                    jnp.zeros_like(pts))
    return sampled, pts, sample_ind, valid


def pts2depth(sampled_pts: jnp.ndarray, all_pts: jnp.ndarray,
              feats: jnp.ndarray, h: int, w: int,
              point_impl: str = "xla") -> jnp.ndarray:
    """Scatter per-point features back onto the (h, w) grid via 3-NN
    inverse-distance interpolation (build_backbone.py:448-455).
    feats: (B, n, C) -> (B, h, w, C)."""
    dist2, idx = three_nn(all_pts, sampled_pts, impl=point_impl)
    weight = interpolation_weights(dist2)
    interp = three_interpolate(feats, idx, weight)
    b, _, c = interp.shape
    return interp.reshape(b, h, w, c)


class HCMoCoPNModel(nn.Module):
    """HRNet(RGB) + PointNet++(depth cloud) + SemGCN (arch='HRNetPN')."""

    width: int = 18
    feat_dim: int = 128
    head: str = "linear"
    linear_feat_map: bool = False
    pool_method: str = "mean"
    skeleton_meta: str = "mpii"
    sgcn_dim: int = 128
    pn_dim: int = 128
    n_points: int = 4096
    point_impl: str = "xla"
    pn_remat: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, rgbd, skeleton, depth_mask, grid_xy, ori_h, ori_w,
                 mean, train: bool = True, return_fm: bool = False,
                 project: bool = True):
        hr_cfg = HRNET_CONFIGS[self.width]
        x1 = rgbd[..., :3]
        depth = rgbd[..., 3]  # single mean-normalized channel

        fm1 = HRNet(hr_cfg, dtype=self.dtype, name="encoder1")(x1, train)

        rng = self.make_rng("points") if train else jax.random.PRNGKey(0)
        sampled, all_pts, _, cloud_ok = depth2pts(
            depth, depth_mask, grid_xy, ori_h, ori_w, mean, rng,
            self.n_points)
        npoints = tuple(max(self.n_points // (4 ** k), 1)
                        for k in range(4))
        # MLPs run in the model compute dtype (bf16 on TPU: the grouped
        # (B, M, S, F) intermediates are the largest tensors in the step);
        # the geometry ops (FPS/ball-query/3-NN) stay fp32 inside
        # ops/point_ops regardless
        pn = Pointnet2MSG(npoints=npoints, point_impl=self.point_impl,
                          remat_levels=(0, 1) if self.pn_remat else (),
                          dtype=self.dtype, name="encoder2")
        fm2 = pn(sampled, train, sample_ok=cloud_ok)  # (B, n_points, 128)

        fj = SemGCN(self.sgcn_dim, 4, self.skeleton_meta,
                    name="encoder3")(skeleton, train)

        pooled = []
        for f in fm1:
            f32 = f.astype(jnp.float32)
            pooled.append(jnp.mean(f32, axis=(1, 2))
                          if self.pool_method == "mean"
                          else jnp.max(f32, axis=(1, 2)))
        pooled1 = jnp.concatenate(pooled, axis=-1)
        pooled2 = jnp.mean(fm2.astype(jnp.float32), axis=1)
        pooled3 = jnp.mean(fj.astype(jnp.float32), axis=1)

        out = {"pooled1": pooled1, "pooled2": pooled2, "pooled3": pooled3}
        if project:
            out["feat1"] = ProjectionHead(self.feat_dim, self.head,
                                          name="head1")(pooled1)
            out["feat2"] = ProjectionHead(self.feat_dim, self.head,
                                          name="head2")(pooled2)
            out["feat3"] = ProjectionHead(self.feat_dim, self.head,
                                          name="head3")(pooled3)
        if return_fm:
            out.update(fm1=fm1, fm2=fm2, fm3=fj)
            if self.linear_feat_map:
                merge1 = merge_all_res(fm1)
                lin1 = nn.Conv(self.sgcn_dim, (1, 1), use_bias=True,
                               dtype=self.dtype, name="encoder1_linear")
                out["merge1"] = merge1
                out["linear_merge1"] = lin1(merge1).astype(jnp.float32)
                # encoder2_linear is Conv1d+BN+ReLU (build_backbone.py:368)
                lm2 = SharedMLP((self.sgcn_dim,), dtype=self.dtype,
                                name="encoder2_linear")(fm2, train)
                lm2 = lm2.astype(jnp.float32)
                h, w = rgbd.shape[1], rgbd.shape[2]
                lm2 = pts2depth(sampled, all_pts, lm2, h, w,
                                point_impl=self.point_impl)
                # nearest-resize to linear_merge1 resolution (the
                # reference's F.interpolate default)
                th, tw = out["linear_merge1"].shape[1:3]
                lm2 = jax.image.resize(
                    lm2, (lm2.shape[0], th, tw, lm2.shape[-1]),
                    method="nearest")
                out["merge2"] = fm2
                out["linear_merge2"] = lm2
        return out
