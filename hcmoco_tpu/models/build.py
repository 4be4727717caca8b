"""Model assembly + registry.

Reference: `pycontrast/networks/build_backbone.py` — `build_model(opt)` /
NAME_TO_FUNC (:516-566) keyed on modal+arch; the flagship HCMoCo model is
`CMC3HRNetSGCNSingleHead` (:186-303) = HRNet(RGB) + HRNet(depth) + SemGCN with
per-encoder pooled projection heads and optional 1x1 "linear feat map" convs
for the stage-2 dense losses.

TPU-first deltas: NHWC everywhere, outputs returned as a dict (instead of the
reference's positional-tuple modes), and the depth encoder consumes the
replicated-to-3ch depth exactly as the reference does (dataset.py:149,243) so
exported stems remain downstream-compatible.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..core.config import TrainConfig, HRNET_CONFIGS
from .hrnet import HRNet, merge_all_res
from .sgcn import SemGCN
from .heads import ProjectionHead, l2_normalize
from .resnet import make_resnet

Dtype = Any


def _pool(feats: Sequence[jnp.ndarray], method: str) -> jnp.ndarray:
    """Pool each of the 4 HRNet maps globally and concat (270-d for W18).
    Reference: forward pooling loop (build_backbone.py:266-281)."""
    pooled = []
    for f in feats:
        f32 = f.astype(jnp.float32)
        pooled.append(
            jnp.mean(f32, axis=(1, 2)) if method == "mean"
            else jnp.max(f32, axis=(1, 2))
        )
    return jnp.concatenate(pooled, axis=-1)


class HCMoCoModel(nn.Module):
    """The flagship tri-modal model (CMC3HRNetSGCNSingleHead).

    Inputs:
      rgbd: (B, H, W, 6) NHWC — rgb(3) + depth replicated to 3ch
      skeleton: (B, J, 2) normalized 2D joints
    Output dict:
      feat1/feat2/feat3: (B, 128) L2-normalized projections
      pooled1/pooled2/pooled3: pre-head pooled features (test mode)
      fm1/fm2: lists of 4 HRNet maps (when return_fm)
      merge1/merge2, linear_merge1/linear_merge2: dense maps (when
        return_fm and linear_feat_map), stride 4, NHWC
    """

    width: int = 18
    feat_dim: int = 128
    head: str = "linear"
    in_channel_list: Tuple[int, ...] = (3, 3)
    linear_feat_map: bool = False
    pool_method: str = "mean"
    skeleton_meta: str = "mpii"
    sgcn_dim: int = 128
    pair_encoders: bool = False
    channel_pad: int = 0  # MFU experiment: lane-friendly padded widths
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, rgbd: jnp.ndarray, skeleton: jnp.ndarray,
                 train: bool = True, return_fm: bool = False,
                 project: bool = True) -> Dict[str, jnp.ndarray]:
        hr_cfg = HRNET_CONFIGS[self.width]
        c1 = self.in_channel_list[0]
        x1 = rgbd[..., :c1]
        x2 = rgbd[..., c1:c1 + self.in_channel_list[1]]

        if self.pair_encoders:
            # TPU fusion: run both identically-shaped encoders as ONE
            # vmapped program — every conv lowers to a feature_group_count=2
            # grouped conv and every BN/elementwise op covers both
            # encoders, halving the XLA op count (same math; params carry a
            # leading [2] axis — see export/transfer pairing helpers)
            assert self.in_channel_list[0] == self.in_channel_list[1]
            PairHR = nn.vmap(
                HRNet, in_axes=(0, None), out_axes=0,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True})
            fm12 = PairHR(hr_cfg, dtype=self.dtype, name="encoder_pair")(
                jnp.stack([x1, x2]), train)
            fm1 = [m[0] for m in fm12]
            fm2 = [m[1] for m in fm12]
        else:
            fm1 = HRNet(hr_cfg, dtype=self.dtype, pad_to=self.channel_pad,
                        name="encoder1")(x1, train)
            fm2 = HRNet(hr_cfg, dtype=self.dtype, pad_to=self.channel_pad,
                        name="encoder2")(x2, train)
        fj = SemGCN(self.sgcn_dim, 4, self.skeleton_meta,
                    name="encoder3")(skeleton, train)

        pooled1 = _pool(fm1, self.pool_method)
        pooled2 = _pool(fm2, self.pool_method)
        pooled3 = jnp.mean(fj.astype(jnp.float32), axis=1)

        out: Dict[str, Any] = {
            "pooled1": pooled1, "pooled2": pooled2, "pooled3": pooled3,
        }
        if project:
            out["feat1"] = ProjectionHead(self.feat_dim, self.head,
                                          name="head1")(pooled1)
            out["feat2"] = ProjectionHead(self.feat_dim, self.head,
                                          name="head2")(pooled2)
            out["feat3"] = ProjectionHead(self.feat_dim, self.head,
                                          name="head3")(pooled3)

        if return_fm:
            out["fm1"] = fm1
            out["fm2"] = fm2
            out["fm3"] = fj
            if self.linear_feat_map:
                merge1 = merge_all_res(fm1)
                merge2 = merge_all_res(fm2)
                lin1 = nn.Conv(self.sgcn_dim, (1, 1), use_bias=True,
                               dtype=self.dtype, name="encoder1_linear")
                lin2 = nn.Conv(self.sgcn_dim, (1, 1), use_bias=True,
                               dtype=self.dtype, name="encoder2_linear")
                out["merge1"], out["merge2"] = merge1, merge2
                out["linear_merge1"] = lin1(merge1).astype(jnp.float32)
                out["linear_merge2"] = lin2(merge2).astype(jnp.float32)
        return out


class SingleModalModel(nn.Module):
    """RGBSingleHead / RGBMultiHeads analog (build_backbone.py:14-83):
    ResNet + proj head, optional PIRL jigsaw head."""

    arch: str = "resnet50"
    feat_dim: int = 128
    head: str = "linear"
    in_channel: int = 3
    jigsaw: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True, project: bool = True,
                 x_jig=None, shuffle_ids=None):
        enc = make_resnet(self.arch, in_channel=self.in_channel,
                          dtype=self.dtype).copy(name="encoder")
        pooled = enc(x, train)
        out = {"pooled": pooled}
        if project:
            out["feat"] = ProjectionHead(self.feat_dim, self.head,
                                         name="head")(pooled)
        if self.jigsaw and x_jig is not None:
            from .heads import JigsawHead

            # x_jig: (B*9, h, w, c) patch stack (RGBMultiHeads.forward)
            pj = enc(x_jig, train)
            out["feat_jig"] = JigsawHead(self.feat_dim, k=9,
                                         head=self.head,
                                         name="head_jig")(pj, shuffle_ids)
        return out


class CMCDualModel(nn.Module):
    """CMCSingleHead / CMCMultiHeads analog (build_backbone.py:85-184):
    channel-split two ResNets + per-modality heads; with ``jigsaw`` the PIRL
    patch stack runs through the same encoders and per-modality JigsawHeads
    (CMCMultiHeads.forward mode 0, build_backbone.py:160-178)."""

    arch: str = "resnet50"
    feat_dim: int = 128
    head: str = "linear"
    in_channel_list: Tuple[int, ...] = (1, 2)
    jigsaw: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True, project: bool = True,
                 x_jig=None, shuffle_ids=None):
        c1 = self.in_channel_list[0]
        x1, x2 = x[..., :c1], x[..., c1:]
        enc1 = make_resnet(self.arch, in_channel=c1,
                           dtype=self.dtype).copy(name="encoder1")
        enc2 = make_resnet(self.arch, in_channel=self.in_channel_list[1],
                           dtype=self.dtype).copy(name="encoder2")
        p1 = enc1(x1, train)
        p2 = enc2(x2, train)
        out = {"pooled1": p1, "pooled2": p2}
        if project:
            out["feat1"] = ProjectionHead(self.feat_dim, self.head,
                                          name="head1")(p1)
            out["feat2"] = ProjectionHead(self.feat_dim, self.head,
                                          name="head2")(p2)
        if self.jigsaw and x_jig is not None:
            from .heads import JigsawHead

            # x_jig: (B*9, h, w, c1+c2) patch stack, channel-split like x
            pj1 = enc1(x_jig[..., :c1], train)
            pj2 = enc2(x_jig[..., c1:], train)
            out["feat1_jig"] = JigsawHead(self.feat_dim, k=9, head=self.head,
                                          name="head1_jig")(pj1, shuffle_ids)
            out["feat2_jig"] = JigsawHead(self.feat_dim, k=9, head=self.head,
                                          name="head2_jig")(pj2, shuffle_ids)
        return out


class CMCSharedModel(nn.Module):
    """Legacy shared-trunk CMC model over `resnet_cmc.py`'s CMCResNet: one
    trunk, pooled feature split in half (L | ab), per-half projection
    heads.  The reference ships this encoder family unwired
    (`cmc_model_dict`, resnet_cmc.py:234-238 — no build_backbone entry);
    exposed here for completeness as arch '<resnet>cmc'."""

    arch: str = "resnet50"
    feat_dim: int = 128
    head: str = "linear"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True, project: bool = True,
                 x_jig=None, shuffle_ids=None):
        from .resnet import make_cmc_resnet

        p1, p2 = make_cmc_resnet(self.arch, dtype=self.dtype).copy(
            name="encoder")(x, train)
        out = {"pooled1": p1, "pooled2": p2}
        if project:
            out["feat1"] = ProjectionHead(self.feat_dim, self.head,
                                          name="head1")(p1)
            out["feat2"] = ProjectionHead(self.feat_dim, self.head,
                                          name="head2")(p2)
        return out


def pair_encoder_params(tree1, tree2):
    """Stack two identically-structured encoder param/stat trees into the
    leading-[2] layout `pair_encoders=True` uses (encoder1 at index 0)."""
    import jax

    return jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]),
                                  tree1, tree2)


def unpair_encoder_params(paired):
    """Inverse of pair_encoder_params: (encoder1_tree, encoder2_tree)."""
    import jax

    t1 = jax.tree_util.tree_map(lambda x: x[0], paired)
    t2 = jax.tree_util.tree_map(lambda x: x[1], paired)
    return t1, t2


def build_model(cfg: TrainConfig) -> nn.Module:
    """Registry dispatch; key = modal + arch (build_backbone.py:516-546)."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    if cfg.modal == "RGBD2S":
        if cfg.arch == "HRNet":
            return HCMoCoModel(
                width=cfg.width,
                feat_dim=cfg.feat_dim,
                head=cfg.head,
                in_channel_list=tuple(cfg.in_channel_list[:2]) or (3, 3),
                linear_feat_map=cfg.linear_feat_map,
                pool_method=cfg.pool_method,
                skeleton_meta=cfg.skeleton_meta_name,
                pair_encoders=cfg.pair_encoders,
                channel_pad=cfg.channel_pad,
                dtype=dtype,
            )
        if cfg.arch == "HRNetPN":
            import jax

            from .pointnet2_model import HCMoCoPNModel

            point_impl = ("pallas" if jax.default_backend() == "tpu"
                          else "xla")
            return HCMoCoPNModel(
                point_impl=point_impl,
                width=cfg.width,
                feat_dim=cfg.feat_dim,
                head=cfg.head,
                linear_feat_map=cfg.linear_feat_map,
                pool_method=cfg.pool_method,
                skeleton_meta=cfg.skeleton_meta_name,
                n_points=cfg.pn_num_points,
                pn_remat=cfg.pn_remat,
                dtype=dtype,
            )
        raise NotImplementedError(f"arch {cfg.arch} for RGBD2S")
    if cfg.modal == "CMC":
        if cfg.arch.endswith("cmc"):
            # legacy shared-trunk CMC ResNet (resnet_cmc.py; the reference
            # keeps it unwired — reachable here as e.g. --arch resnet50cmc)
            if cfg.jigsaw:
                raise NotImplementedError(
                    "jigsaw/PIRL is not defined for the legacy shared-trunk "
                    "CMC ResNet (resnet_cmc.py has no jigsaw integration); "
                    "use the dual-encoder CMC archs")
            return CMCSharedModel(arch=cfg.arch[:-3], feat_dim=cfg.feat_dim,
                                  head=cfg.head, dtype=dtype)
        return CMCDualModel(arch=cfg.arch, feat_dim=cfg.feat_dim,
                            head=cfg.head,
                            in_channel_list=tuple(cfg.in_channel_list),
                            jigsaw=cfg.jigsaw,
                            dtype=dtype)
    if cfg.modal == "RGB":
        return SingleModalModel(arch=cfg.arch, feat_dim=cfg.feat_dim,
                                head=cfg.head, jigsaw=cfg.jigsaw,
                                dtype=dtype)
    raise NotImplementedError(f"modal {cfg.modal}")
