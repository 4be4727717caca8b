"""Typed configuration tree for hcmoco_tpu.

Replaces the reference's two config systems — the argparse hierarchy with
method-preset overrides (`pycontrast/options/base_options.py:12-29,168-177`)
and the yacs HRNet stage YAMLs
(`pycontrast/networks/official_hrnet/seg_hrnet_w{18,32,48}_*.yaml`) — with one
set of frozen dataclasses.  Every launch-script recipe becomes a named config
(see `RECIPES` at the bottom).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, replace
from typing import Optional, Sequence, Tuple


# ---------------------------------------------------------------------------
# HRNet stage specifications
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class HRNetStageSpec:
    """One HRNet stage (reference: STAGE{2,3,4} blocks of the seg YAMLs)."""

    num_modules: int
    num_branches: int
    block: str  # 'BASIC' | 'BOTTLENECK'
    num_blocks: Tuple[int, ...]
    num_channels: Tuple[int, ...]
    fuse_method: str = "SUM"


@dataclass(frozen=True)
class HRNetConfig:
    """Full HRNetV2 backbone spec.

    Width-18/32/48 variants mirror the reference's bundled YAMLs
    (`official_hrnet.py:484-503`): stem = two stride-2 3x3 convs to 64ch,
    stage1 = 4 Bottleneck blocks at 64ch (output 256), stages 2-4 multi-branch
    BasicBlock stages with SUM fusion.
    """

    width: int
    stage1: HRNetStageSpec
    stage2: HRNetStageSpec
    stage3: HRNetStageSpec
    stage4: HRNetStageSpec
    stem_channels: int = 64
    bn_momentum: float = 0.99  # = 1 - torch BN_MOMENTUM(0.01), official_hrnet.py:23

    @property
    def branch_channels(self) -> Tuple[int, ...]:
        return self.stage4.num_channels

    @property
    def total_channels(self) -> int:
        return sum(self.stage4.num_channels)


def _hrnet(width: int) -> HRNetConfig:
    c = (width, width * 2, width * 4, width * 8)
    return HRNetConfig(
        width=width,
        stage1=HRNetStageSpec(1, 1, "BOTTLENECK", (4,), (64,)),
        stage2=HRNetStageSpec(1, 2, "BASIC", (4, 4), c[:2]),
        stage3=HRNetStageSpec(4, 3, "BASIC", (4, 4, 4), c[:3]),
        stage4=HRNetStageSpec(3, 4, "BASIC", (4, 4, 4, 4), c),
    )


HRNET_W18 = _hrnet(18)
HRNET_W32 = _hrnet(32)
HRNET_W48 = _hrnet(48)

# A miniature variant (width 4, one module / one block per stage) for unit
# tests and sharding dry-runs on the virtual CPU mesh — structurally
# identical, ~1000x cheaper to compile.
HRNET_TINY = HRNetConfig(
    width=4,
    stage1=HRNetStageSpec(1, 1, "BOTTLENECK", (1,), (8,)),
    stage2=HRNetStageSpec(1, 2, "BASIC", (1, 1), (4, 8)),
    stage3=HRNetStageSpec(1, 3, "BASIC", (1, 1, 1), (4, 8, 16)),
    stage4=HRNetStageSpec(1, 4, "BASIC", (1, 1, 1, 1), (4, 8, 16, 32)),
)

HRNET_CONFIGS = {18: HRNET_W18, 32: HRNET_W32, 48: HRNET_W48, 4: HRNET_TINY}


# ---------------------------------------------------------------------------
# Method presets (reference override_dict, base_options.py:12-22)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MethodPreset:
    modal: str  # 'RGB' | 'CMC' | 'RGBD2S'
    jigsaw: bool
    mem: str  # 'bank' | 'moco' | 'bank+jointspri3d'
    aug: str  # 'A'..'E'
    head: str  # 'linear' | 'mlp'
    nce_t: float


METHOD_PRESETS = {
    "InsDis": MethodPreset("RGB", False, "bank", "A", "linear", 0.07),
    "CMC": MethodPreset("CMC", False, "bank", "C", "linear", 0.07),
    "MoCo": MethodPreset("RGB", False, "moco", "A", "linear", 0.07),
    "PIRL": MethodPreset("RGB", True, "bank", "A", "linear", 0.07),
    "MoCov2": MethodPreset("RGB", False, "moco", "B", "mlp", 0.2),
    "CMCv2": MethodPreset("CMC", False, "moco", "E", "mlp", 0.2),
    "InfoMin": MethodPreset("RGB", True, "moco", "D", "mlp", 0.15),
    "CMCRGBD2S": MethodPreset("RGBD2S", False, "bank", "C", "linear", 0.07),
    "CMCJointsPri3DRGBD2S": MethodPreset(
        "RGBD2S", False, "bank+jointspri3d", "C", "linear", 0.07
    ),
}


# ---------------------------------------------------------------------------
# Train config
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TrainConfig:
    """Unified training configuration.

    Field names/semantics follow the reference option surface
    (`options/base_options.py`, `options/train_options.py`) so launch-script
    recipes translate one-to-one, but defaults are TPU-appropriate.
    """

    # method / model
    method: str = "Customize"
    modal: str = "RGB"
    arch: str = "HRNet"  # 'HRNet' | 'HRNetPN' | resnet names
    width: int = 18
    head: str = "linear"
    feat_dim: int = 128
    in_channel_list: Tuple[int, ...] = (3, 3)
    linear_feat_map: bool = False
    pool_method: str = "mean"
    skeleton_meta_name: str = "mpii"
    jigsaw: bool = False

    # memory / contrast
    mem: str = "bank"
    nce_k: int = 16384
    nce_m: float = 0.5
    nce_t: float = 0.07
    temperature: float = 0.07  # for pri3d losses
    alpha: float = 0.999  # moco EMA
    pri3d_num_samples_per_image: int = 400
    # cross-subject SCL grouping: the reference computes SCL on each GPU's
    # LOCAL batch (DDP never gathers for it, contrast_trainer.py:830-892).
    # 0 = auto (reference-faithful: one group per data-mesh shard);
    # 1 = one global-batch group; N = explicit group count.  The CLI and
    # dryrun_multichip both derive groups from this + the mesh, so the
    # trained objective matches the multi-chip artifact (PARITY.md "SCL
    # grouping").
    scl_groups: int = 0
    modality_missing: bool = False
    # bank logits formulation (same estimator, different TPU cost):
    #   'counts' (default): gather-free — negatives drawn as Multinomial
    #     counts, loss = count-weighted logsumexp over the dense score
    #     matrix (memory.py::cmc3_losses_counts).  Identical distribution
    #     and, given the same draw multiset, identical loss/grads.
    #   'hybrid': dense score matmul forward + custom-VJP chunked
    #     row-gather backward (no scatter; scalar-gather fwd ~22% of step)
    #   'gather': row-gather + einsum fwd/bwd (round-1 formulation)
    #   'dense': dense matmul + take_along_axis both ways (backward
    #     scatters, ~37% of the round-1 step — parity-harness choice)
    bank_logits: str = "counts"
    # counts/dense/hybrid build (global_bsz, n_data)-shaped intermediates;
    # above this dataset size the step falls back to 'gather' (the only
    # formulation whose footprint is independent of n_data)
    counts_max_n_data: int = 131072
    dense_scores: bool = False  # back-compat alias for bank_logits='dense'
    # run the RGB+depth encoders as one vmapped program (grouped convs,
    # halved op count — TPU perf flag; params gain a leading [2] axis)
    pair_encoders: bool = False
    # MFU experiment: round every HRNet conv width up to a multiple of
    # this (zero-masked padded channels; real-channel math unchanged)
    channel_pad: int = 0
    # remat the PointNet++ SA MLPs (recompute grouped intermediates in the
    # backward; measured slower than bf16 at bs64 -- PERF.md round 3)
    pn_remat: bool = False
    beta: float = 0.5  # PIRL jigsaw-vs-instance weight (train_options.py)

    # optimization
    epochs: int = 200
    batch_size: int = 256  # GLOBAL batch size
    learning_rate: float = 0.03
    lr_decay_epochs: Tuple[int, ...] = (120, 160)
    lr_decay_rate: float = 0.1
    weight_decay: float = 1e-4
    momentum: float = 0.9
    cosine: bool = False
    warm: bool = False
    warmup_from: float = 0.01
    warm_epochs: int = 5
    steps_per_epoch: int = 0  # filled by the data pipeline

    # data
    dataset: str = ""
    data_folder: str = "./data"
    train_file_list: str = ""
    val_file_list: str = ""
    mpii_root: str = ""
    coco_root: str = ""
    seg_root: str = ""
    seg_file_list: str = ""
    seg_val_file_list: str = ""
    packed_dir: str = ""  # decode-free memmapped NTU pack (data/packed.py)
    aug: str = "C"
    crop_size: int = 320
    random_flip: bool = False
    not_use_weighted_sampler: bool = False

    # versatility / segmentation
    n_class: int = 25
    supervise_type: int = 0  # 0:rgbd 1:rgb 2:depth 3:none
    mask_seg_depth: bool = False
    mask_seg_rgb: bool = False
    test_type: int = 0
    cmc_loss_weights: float = 1.0
    other_loss_weights: float = 1.0

    # HRNetPN point-cloud branch: original depth frame size for the
    # back-projection intrinsics (Kinect depth frame, 424x512; the
    # reference reads these from the batch, dataset.py:1105-1118)
    pn_ori_h: float = 424.0
    pn_ori_w: float = 512.0
    pn_num_points: int = 4096

    # precision / parallelism
    # scan-microbatched step: split the per-step batch into n sequential
    # microbatches inside ONE jitted step (grad accumulation; BN stats and
    # bank EMA chain through microbatches).  Activation residency stays at
    # the microbatch size, so effective batches beyond the HBM limit
    # become reachable (PERF.md round-5 experiment).
    microbatch: int = 1
    remat: bool = False  # rematerialize the encoder forward (bigger batch)
    # remat policy: 'conv_out' saves only pre-BN conv outputs (backward
    # recomputes cheap elementwise BN/ReLU, never a conv); 'dots' is the
    # round-1 dots_with_no_batch_dims policy (full conv recompute)
    remat_policy: str = "conv_out"
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    mesh_shape: Tuple[int, ...] = (-1,)  # -1 = all devices on the data axis
    mesh_axes: Tuple[str, ...] = ("data",)

    # io
    model_path: str = "./save"
    resume: str = ""
    pretrain: Optional[str] = None
    save_freq: int = 20
    print_freq: int = 10
    seed: int = 0

    @property
    def model_name(self) -> str:
        # mirrors TrainOptions.modify_options naming (train_options.py:39-47)
        return (
            f"{self.method}_{self.arch}_{self.modal}_Jig_{self.jigsaw}_"
            f"{self.mem}_aug_{self.aug}_{self.head}_{self.nce_t}"
        )

    @property
    def hrnet(self) -> HRNetConfig:
        return HRNET_CONFIGS[self.width]

    @property
    def num_joints(self) -> int:
        return {"mpii": 16, "coco_reduce": 13}[self.skeleton_meta_name]


def resolve_config(cfg: TrainConfig) -> TrainConfig:
    """Apply method-preset overrides + warmup derivation.

    Reference: BaseOptions.override_options (base_options.py:168-177) and
    TrainOptions.modify_options warmup block (train_options.py:49-64).
    """
    import math

    if cfg.method in METHOD_PRESETS:
        p = METHOD_PRESETS[cfg.method]
        cfg = replace(
            cfg, modal=p.modal, jigsaw=p.jigsaw, mem=p.mem, aug=p.aug,
            head=p.head, nce_t=p.nce_t,
        )
    if cfg.modal == "CMC" and tuple(cfg.in_channel_list) == (3, 3):
        # CMC's split is L|ab over a 3-channel YDbDr/Lab image — the
        # reference head default in_channel_list=[1, 2]
        # (build_backbone.py:87); (3, 3) is the tri-modal HCMoCo default
        cfg = replace(cfg, in_channel_list=(1, 2))
    warm = cfg.warm or cfg.batch_size > 256
    updates = {"warm": warm}
    if warm:
        updates["warm_epochs"] = 10 if cfg.epochs > 500 else 5
        if cfg.cosine:
            eta_min = cfg.learning_rate * (cfg.lr_decay_rate ** 3)
            warmup_to = eta_min + (cfg.learning_rate - eta_min) * (
                1 + math.cos(math.pi * updates["warm_epochs"] / cfg.epochs)
            ) / 2
        else:
            warmup_to = cfg.learning_rate
        updates["warmup_to"] = warmup_to
    cfg = replace(cfg, **{k: v for k, v in updates.items() if hasattr(cfg, k)})
    # stash warmup_to via object.__setattr__-free route: store on a dict field?
    # keep it simple: recompute in schedules from the same formula.
    return cfg


# ---------------------------------------------------------------------------
# Named recipes: the 15 SLURM launch scripts as configs
# (pycontrast/scripts/{FirstStage,SecondStage,Versatility}/*.sh)
# ---------------------------------------------------------------------------


def _first_stage(**kw) -> TrainConfig:
    base = TrainConfig(
        method="CMCRGBD2S",
        arch="HRNet",
        width=18,
        dataset="NTUMPII",
        batch_size=224,
        epochs=100,
        learning_rate=0.03,
        cosine=True,
        nce_k=16384,
        modality_missing=True,
        crop_size=320,
        random_flip=True,
    )
    return resolve_config(replace(base, **kw))


def _second_stage(**kw) -> TrainConfig:
    base = TrainConfig(
        method="CMCJointsPri3DRGBD2S",
        arch="HRNet",
        width=18,
        dataset="NTUMPII",
        batch_size=224,
        epochs=100,
        learning_rate=0.03,
        cosine=True,
        nce_k=16384,
        modality_missing=True,
        linear_feat_map=True,
        pri3d_num_samples_per_image=400,
        temperature=0.07,
        crop_size=320,
        random_flip=True,
    )
    return resolve_config(replace(base, **kw))


RECIPES = {
    # FirstStage/
    "first_stage/ntumpiirgbd2s_hrnet_w18": _first_stage(),
    "first_stage/ntumpiirgbd2s_hrnet_w32": _first_stage(width=32),
    "first_stage/ntumpiirgbd2s_hrnet_w48": _first_stage(width=48),
    "first_stage/ntucocorgbd2s_hrnet_w18": _first_stage(
        dataset="NTUCOCO", skeleton_meta_name="coco_reduce"
    ),
    "first_stage/ntumpiirgbd2s_hrnetpn_w18": _first_stage(arch="HRNetPN"),
    # SecondStage/
    "second_stage/ntumpiirgbd2s_hrnet_w18": _second_stage(),
    "second_stage/ntumpiirgbd2s_hrnet_w32": _second_stage(width=32),
    "second_stage/ntumpiirgbd2s_hrnet_w48": _second_stage(width=48),
    "second_stage/ntucocorgbd2s_hrnet_w18": _second_stage(
        dataset="NTUCOCO", skeleton_meta_name="coco_reduce"
    ),
    "second_stage/ntumpiirgbd2s_hrnetpn_w18": _second_stage(arch="HRNetPN"),
    # Versatility/ (joint contrast + cross-modal supervised seg)
    "versatility/sup_rgbd": _second_stage(
        dataset="NTUSeg", supervise_type=0, test_type=0
    ),
    "versatility/sup_rgb_test_d": _second_stage(
        dataset="NTUSeg", supervise_type=1, test_type=2, mask_seg_depth=True
    ),
    "versatility/sup_d_test_rgb": _second_stage(
        dataset="NTUSeg", supervise_type=2, test_type=1, mask_seg_rgb=True
    ),
    "versatility/sup_none": _second_stage(
        dataset="NTUSeg", supervise_type=3, test_type=0
    ),
    # smoke-scale config #1 from BASELINE.json
    "mini/rgb_insdis": resolve_config(
        TrainConfig(
            method="InsDis", arch="resnet50", dataset="NTURGBD",
            batch_size=8, nce_k=128, epochs=2,
        )
    ),
}


def to_dict(cfg: TrainConfig) -> dict:
    return dataclasses.asdict(cfg)
