"""Reference loss-curve parity golden generator (VERDICT round-1 item 2).

Runs the reference torch trainer loops — `_train_mem_skeleton3d`
(contrast_trainer.py:532-640, stage 1) and `_train_bank_joints_pri3d_cmc3`
(:894-1039, stage 2) — at tiny scale on CPU with every stochastic input
pinned (tests/parity_common.py): crc32-synth weights, synth memory banks,
seeded synthetic batches, pinned negative-sample indices (multinomial.draw
monkeypatched) and, for stage 2, pinned soft-pri3d pixel samples
(Tensor.multinomial monkeypatched).  Per-step losses from the loop's own
AverageMeter updates are recorded into tests/golden/ref_loss_curve_s{N}.npz;
tests/test_ref_parity.py replays the identical setup through our jitted
train step and asserts per-step agreement.

Run from the repo root:  python tools/ref_parity.py --stage 1
(imports the reference package from /root/reference/pycontrast read-only; no
reference code is copied into the repo).
"""

import argparse
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/pycontrast"
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, REF)

import parity_common as pc  # noqa: E402

# ---- torch CPU shims (reference code calls .cuda() everywhere) ----
sys.path.insert(0, os.path.join(REPO, "tools"))
import yacs_shim  # noqa: E402

yacs_shim.install()
sys.modules.setdefault(
    "tensorboard_logger", types.SimpleNamespace(Logger=object))
# build_backbone imports the PointNet++ CUDA extension at module scope; the
# HRNet flagship never touches it — stub the binary module
sys.modules.setdefault("pointnet2_cuda", types.ModuleType("pointnet2_cuda"))
import torch  # noqa: E402

torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self
torch.manual_seed(0)

from networks.build_backbone import (  # noqa: E402
    CMC3HRNetSGCNSingleHead, RGBSingleHead)
from networks.fcn import FCNHead  # noqa: E402
from memory.mem_bank import CMCMem3  # noqa: E402
from memory.mem_moco import RGBMoCo  # noqa: E402
from learning.contrast_trainer import ContrastTrainer  # noqa: E402
from learning.segment_trainer import SegTrainer  # noqa: E402
from learning import util as lutil  # noqa: E402


class FixedDraw:
    """Replaces AliasMethod.draw with the pinned per-step indices."""

    def __init__(self):
        self.queue = []

    def push(self, idx_flat):
        self.queue.append(torch.from_numpy(np.ascontiguousarray(idx_flat)))

    def __call__(self, n):
        out = self.queue.pop(0)
        assert out.numel() == n, (out.numel(), n)
        return out


_ORIG_MULTINOMIAL = torch.Tensor.multinomial


class FixedMultinomial:
    """Replaces torch.Tensor.multinomial for the stage-2 soft-pri3d pixel
    sample (contrast_trainer.py:685).  Rows are matched by count: the
    reference calls it on the row-masked valid-probability matrix; our
    synthetic depth masks guarantee every image has valid pixels, so the
    row count always equals the batch size."""

    def __init__(self):
        self.queue = []
        self.orig = _ORIG_MULTINOMIAL

    def push(self, pix_idx):
        self.queue.append(torch.from_numpy(np.ascontiguousarray(pix_idx)))

    def __call__(self, tensor, num_samples, replacement=False, **kw):
        if not self.queue:
            return self.orig(tensor, num_samples, replacement=replacement,
                             **kw)
        out = self.queue.pop(0)
        assert out.shape == (tensor.shape[0], num_samples), (
            out.shape, tensor.shape, num_samples)
        return out


_ORIG_METER_UPDATE = lutil.AverageMeter.update


class MeterTap:
    """Record every AverageMeter.update value in call order; the trainer
    loops update a fixed set of meters per step, so chunking the record by
    that count recovers per-step sequences."""

    def __init__(self):
        self.values = []
        self.orig = _ORIG_METER_UPDATE

    def install(self):
        tap = self

        def update(mself, val, n=1):
            tap.values.append(float(val))
            tap.orig(mself, val, n)

        lutil.AverageMeter.update = update

    def per_step(self, n_per_step):
        v = self.values
        assert len(v) % n_per_step == 0, (len(v), n_per_step)
        return np.asarray(v, np.float64).reshape(-1, n_per_step)


def run_reference(stage, steps, perturb=0.0):
    """One pinned reference-trainer run; returns the per-step loss dict.

    perturb > 0 multiplies every weight by (1 + perturb*randn): a second
    run with perturb=1e-6 measures the INTRINSIC fp32 chaos of this
    training trajectory, which calibrates the parity test's tolerance
    (our independent fp32 implementation cannot be expected to track the
    reference more closely than the reference tracks itself under a
    1-ulp-scale perturbation)."""
    stage2 = stage == 2

    args = types.SimpleNamespace(
        jigsaw=False, gpu=0, arch="HRNet", modality_missing=True, amp=False,
        local_rank=0, warm=False, print_freq=1,
        mem="bank+jointspri3d" if stage2 else "bank",
        modal="RGBD2S", method="CMCRGBD2S",
        nce_k=pc.NCE_K, nce_t=pc.NCE_T, nce_m=pc.NCE_M,
        feat_dim=pc.FEAT_DIM, skeleton_meta_name="mpii",
        learning_rate=pc.LR, momentum=pc.MOMENTUM,
        weight_decay=pc.WEIGHT_DECAY,
        pri3d_num_samples_per_image=8, temperature=0.07,
    )

    # the reference loads its HRNet yaml via a cwd-relative path
    cwd = os.getcwd()
    os.chdir(REF)
    try:
        model = CMC3HRNetSGCNSingleHead(
            name="HRNet", head="linear", feat_dim=pc.FEAT_DIM,
            in_channel_list=[3, 3], linear_feat_map=stage2, width=18,
            pool_method="mean", opt=args)
    finally:
        os.chdir(cwd)
    model = model.float()

    # write the key/shape list, then load the crc32-synth weights
    keys_path = os.path.join(REPO, "tests", "golden",
                             "hcmoco_w18_torch_keys.txt")
    sd = model.state_dict()
    if not stage2:  # stage-1 keys are a subset; write the stage-2 superset
        pass
    with open(keys_path, "w") as f:
        for k, v in sd.items():
            f.write(k + "\t" + ",".join(str(s) for s in v.shape) + "\n")
    synth = pc.synth_state_dict(
        [(k, tuple(v.shape)) for k, v in sd.items()])
    if perturb:
        r = np.random.RandomState(999)
        synth = {k: (v * (1 + perturb * r.randn(*v.shape))
                     .astype(np.float32) if v.ndim else v)
                 for k, v in synth.items()}
    model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in synth.items()})

    contrast = CMCMem3(pc.FEAT_DIM, pc.N_DATA, pc.NCE_K, pc.NCE_T, pc.NCE_M)
    banks = pc.synth_banks()
    with torch.no_grad():
        contrast.memory_1.copy_(torch.from_numpy(banks[0]))
        contrast.memory_2.copy_(torch.from_numpy(banks[1]))
        contrast.memory_3.copy_(torch.from_numpy(banks[2]))
    draw = FixedDraw()
    contrast.multinomial.draw = draw

    criterion = torch.nn.CrossEntropyLoss()
    optimizer = torch.optim.SGD(model.parameters(), lr=pc.LR,
                                momentum=pc.MOMENTUM,
                                weight_decay=pc.WEIGHT_DECAY)

    batches = pc.synth_batches(steps=steps, stage2=stage2)
    mn = FixedMultinomial()
    if stage2:
        for pix in pc.stage2_pixel_indices(
                batches, args.pri3d_num_samples_per_image):
            mn.push(pix)
    loader = []
    for b in batches:
        draw.push(b["neg_idx"].reshape(-1))
        inputs = torch.from_numpy(
            np.transpose(b["rgbd"], (0, 3, 1, 2)).copy())
        dummy = torch.zeros(b["index"].shape[0])
        tup = [
            inputs,                                    # 0
            torch.from_numpy(b["index"]),              # 1
            torch.from_numpy(b["skeleton"]),           # 2
            dummy,                                     # 3
            torch.from_numpy(b.get("joints2d", np.zeros((1,)))),   # 4
            torch.from_numpy(b.get("joints_vis", np.zeros((1,)))),  # 5
            torch.from_numpy(b["use_depth"]),          # 6
            torch.from_numpy(b["depth_mask"]),         # 7
            torch.from_numpy(b.get("scale", np.ones((1,)))),  # 8
            dummy,                                     # 9
            dummy,                                     # 10
            torch.from_numpy(b["use_rgb"]),            # 11
        ]
        loader.append(tuple(tup))

    trainer = ContrastTrainer(args)
    ContrastTrainer._global_gather = staticmethod(lambda x: x)
    tap = MeterTap()
    tap.install()
    if stage2:
        torch.Tensor.multinomial = (
            lambda t, num_samples, replacement=False, **kw:
            mn(t, num_samples, replacement=replacement, **kw))

    if stage2:
        # main_contrast.py:71-73: criterion_pri3d is a LIST of two CEs
        trainer._train_bank_joints_pri3d_cmc3(
            1, loader, model, contrast, criterion,
            [torch.nn.CrossEntropyLoss(), torch.nn.CrossEntropyLoss()],
            optimizer)
        rows = tap.per_step(15)
        # order (contrast_trainer.py:1000-1018): data_time, loss, acc1,
        # acc2, acc3, l_r2d, l_d2r, a_r2d, a_d2r, l_r2j, l_d2j, a_r2j,
        # a_d2j, l_scl, batch_time
        out = {
            "loss": rows[:, 1],
            "loss_rgb2depth": rows[:, 5], "loss_depth2rgb": rows[:, 6],
            "loss_rgb2joint": rows[:, 9], "loss_d2joint": rows[:, 10],
            "loss_scl": rows[:, 13],
        }
    else:
        trainer._train_mem_skeleton3d(
            1, loader, model, contrast, criterion, optimizer)
        rows = tap.per_step(8)
        # order (contrast_trainer.py:584-620): data_time, loss_12, acc_12,
        # loss_23, acc_23, loss_13, acc_13, batch_time
        out = {
            "loss_12": rows[:, 1], "loss_23": rows[:, 3],
            "loss_13": rows[:, 5],
            "acc_12": rows[:, 2], "acc_23": rows[:, 4],
            "acc_13": rows[:, 6],
        }

    # final-state fingerprints for end-state agreement checks
    out["bank_final"] = np.stack([
        contrast.memory_1.numpy(), contrast.memory_2.numpy(),
        contrast.memory_3.numpy()])
    out["head1_w_final"] = model.head1[0].weight.detach().numpy()
    lutil.AverageMeter.update = _ORIG_METER_UPDATE
    if stage2:
        torch.Tensor.multinomial = _ORIG_MULTINOMIAL
    return out


def _perturbed(synth, perturb):
    if not perturb:
        return synth
    r = np.random.RandomState(999)
    return {k: (v * (1 + perturb * r.randn(*v.shape)).astype(np.float32)
                if v.ndim else v)
            for k, v in synth.items()}


def _write_keys(path, sd):
    with open(path, "w") as f:
        for k, v in sd.items():
            f.write(k + "\t" + ",".join(str(s) for s in v.shape) + "\n")


def run_reference_seg(steps, perturb=0.0):
    """Pinned run of SegTrainer.train_soft_joint_pri3d
    (segment_trainer.py:617-824): all stage-2 losses weighted by
    cmc_loss_weights/other_loss_weights + class-weighted seg CE x10 on the
    true_label frames (supervise_type=0 rgbd max-fusion head)."""
    args = types.SimpleNamespace(
        jigsaw=False, gpu=0, arch="HRNet", modality_missing=True, amp=False,
        local_rank=0, warm=False, print_freq=1,
        mem="bank+jointspri3d", modal="RGBD2S", method="CMCRGBD2S",
        nce_k=pc.NCE_K, nce_t=pc.NCE_T, nce_m=pc.NCE_M,
        feat_dim=pc.FEAT_DIM, skeleton_meta_name="mpii",
        learning_rate=pc.LR, momentum=pc.MOMENTUM,
        weight_decay=pc.WEIGHT_DECAY,
        pri3d_num_samples_per_image=8, temperature=0.07,
        n_class=25, supervise_type=0, test_type=0,
        cmc_loss_weights=0.5, other_loss_weights=2.0,
        tb_folder="/tmp/hcmoco_ref_parity_tb",
    )
    os.makedirs(args.tb_folder, exist_ok=True)

    cwd = os.getcwd()
    os.chdir(REF)
    try:
        model = CMC3HRNetSGCNSingleHead(
            name="HRNet", head="linear", feat_dim=pc.FEAT_DIM,
            in_channel_list=[3, 3], linear_feat_map=True, width=18,
            pool_method="mean", opt=args)
    finally:
        os.chdir(cwd)
    model = model.float()
    classifier = FCNHead(128, 128, args.n_class, num_convs=1,
                         kernel_size=1).float()

    _write_keys(os.path.join(REPO, "tests", "golden",
                             "fcn_torch_keys.txt"), classifier.state_dict())
    synth_m = _perturbed(pc.synth_state_dict(
        [(k, tuple(v.shape)) for k, v in model.state_dict().items()]),
        perturb)
    model.load_state_dict({k: torch.from_numpy(v)
                           for k, v in synth_m.items()})
    synth_c = _perturbed(pc.synth_state_dict(
        [(k, tuple(v.shape)) for k, v in classifier.state_dict().items()]),
        perturb)
    classifier.load_state_dict({k: torch.from_numpy(v)
                                for k, v in synth_c.items()})

    contrast = CMCMem3(pc.FEAT_DIM, pc.N_DATA, pc.NCE_K, pc.NCE_T, pc.NCE_M)
    banks = pc.synth_banks()
    with torch.no_grad():
        contrast.memory_1.copy_(torch.from_numpy(banks[0]))
        contrast.memory_2.copy_(torch.from_numpy(banks[1]))
        contrast.memory_3.copy_(torch.from_numpy(banks[2]))
    draw = FixedDraw()
    contrast.multinomial.draw = draw

    # main_segmentor.py:66-79 criteria
    criterion_contrast = torch.nn.CrossEntropyLoss()
    criterion_pri3d = [torch.nn.CrossEntropyLoss(),
                       torch.nn.CrossEntropyLoss()]
    weights = [1.448, 49.234, 49.483, 48.030, 49.247, 49.492, 48.018,
               49.704, 50.052, 49.369, 49.694, 50.090, 49.425, 49.459,
               45.846, 47.156, 45.868, 47.197, 44.167, 42.789, 44.341,
               48.632, 48.873, 48.644, 49.004]
    criterion_seg = [torch.nn.CrossEntropyLoss(
        ignore_index=255,
        weight=torch.from_numpy(np.asarray(weights, np.float32)))]
    optimizer = torch.optim.SGD(
        list(model.parameters()) + list(classifier.parameters()),
        lr=pc.LR, momentum=pc.MOMENTUM, weight_decay=pc.WEIGHT_DECAY)

    batches = pc.synth_seg_batches(steps=steps, n_class=args.n_class)
    mn = FixedMultinomial()
    for pix in pc.stage2_pixel_indices(batches,
                                       args.pri3d_num_samples_per_image):
        mn.push(pix)
    loader = []
    for b in batches:
        draw.push(b["neg_idx"].reshape(-1))
        inputs = torch.from_numpy(
            np.transpose(b["rgbd"], (0, 3, 1, 2)).copy())
        dummy = torch.zeros(b["index"].shape[0])
        loader.append((
            inputs,                                    # 0
            torch.from_numpy(b["index"]),              # 1
            torch.from_numpy(b["skeleton"]),           # 2
            dummy,                                     # 3
            torch.from_numpy(b["joints2d"]),           # 4
            torch.from_numpy(b["joints_vis"]),         # 5
            torch.from_numpy(b["use_depth"]),          # 6
            torch.from_numpy(b["depth_mask"]),         # 7
            torch.from_numpy(b["scale"]),              # 8
            torch.from_numpy(b["label"]),              # 9
            torch.from_numpy(b["true_label"]),         # 10
            torch.from_numpy(b["use_rgb"]),            # 11
        ))

    trainer = SegTrainer(args)
    SegTrainer._global_gather = staticmethod(lambda x: x)
    tap = MeterTap()
    tap.install()
    torch.Tensor.multinomial = (
        lambda t, num_samples, replacement=False, **kw:
        mn(t, num_samples, replacement=replacement, **kw))
    try:
        trainer.train_soft_joint_pri3d(
            1, loader, model, classifier, contrast, criterion_contrast,
            criterion_pri3d, criterion_seg, optimizer)
    finally:
        lutil.AverageMeter.update = _ORIG_METER_UPDATE
        torch.Tensor.multinomial = _ORIG_MULTINOMIAL
    # per-step updates (train_soft_joint_pri3d:768-800, every batch has
    # true_label.sum()>0 by construction): data_time, loss, acc1, acc2,
    # acc3, l_r2d, l_d2r, a_r2d, a_d2r, l_r2j, l_d2j, a_r2j, a_d2j, scl,
    # seg_loss, seg_aacc, batch_time
    rows = tap.per_step(17)
    out = {
        "loss": rows[:, 1],
        "loss_rgb2depth": rows[:, 5], "loss_depth2rgb": rows[:, 6],
        "loss_rgb2joint": rows[:, 9], "loss_d2joint": rows[:, 10],
        "loss_scl": rows[:, 13], "loss_seg": rows[:, 14],
    }
    out["bank_final"] = np.stack([
        contrast.memory_1.numpy(), contrast.memory_2.numpy(),
        contrast.memory_3.numpy()])
    out["cls_w_final"] = classifier.conv_seg.weight.detach().numpy()
    return out


class _DDPShim(torch.nn.Module):
    """Gives the harness model the `.module` attribute _train_moco's
    momentum_update call expects from DDP (contrast_trainer.py:371)."""

    def __init__(self, m):
        super().__init__()
        self.module = m

    def forward(self, *a, **k):
        return self.module(*a, **k)


def run_reference_moco(steps, perturb=0.0):
    """Pinned run of ContrastTrainer._train_moco
    (contrast_trainer.py:255-392): RGBSingleHead(resnet50) two-tower EMA +
    RGBMoCo FIFO queue; ShuffleBN pinned to the identity permutation
    (single process; BN batch statistics are permutation-invariant so any
    fixed permutation yields the same losses)."""
    args = types.SimpleNamespace(
        jigsaw=False, gpu=0, arch="resnet50", modality_missing=False,
        amp=False, local_rank=0, warm=False, print_freq=1,
        mem="moco", modal="RGB", method="MoCo",
        nce_k=pc.MOCO_K, nce_t=pc.NCE_T, nce_m=pc.NCE_M,
        alpha=pc.MOCO_ALPHA,
        feat_dim=pc.FEAT_DIM, learning_rate=pc.LR, momentum=pc.MOMENTUM,
        weight_decay=pc.WEIGHT_DECAY, temperature=0.07,
    )

    model = RGBSingleHead("resnet50", "linear", pc.FEAT_DIM).float()
    model_ema = RGBSingleHead("resnet50", "linear", pc.FEAT_DIM).float()
    _write_keys(os.path.join(REPO, "tests", "golden",
                             "rgb_moco_torch_keys.txt"), model.state_dict())
    synth = _perturbed(pc.synth_state_dict(
        [(k, tuple(v.shape)) for k, v in model.state_dict().items()]),
        perturb)
    tsd = {k: torch.from_numpy(v) for k, v in synth.items()}
    model.load_state_dict(tsd)
    model_ema.load_state_dict(tsd)  # EMA starts as a copy

    contrast = RGBMoCo(pc.FEAT_DIM, pc.MOCO_K, pc.NCE_T)
    with torch.no_grad():
        contrast.memory.copy_(torch.from_numpy(pc.synth_moco_queue()))

    criterion = torch.nn.CrossEntropyLoss()
    optimizer = torch.optim.SGD(model.parameters(), lr=pc.LR,
                                momentum=pc.MOMENTUM,
                                weight_decay=pc.WEIGHT_DECAY)

    batches = pc.synth_moco_batches(steps=steps)
    loader = [(
        torch.from_numpy(np.transpose(b["rgbd"], (0, 3, 1, 2)).copy()),
        torch.from_numpy(b["index"]),
    ) for b in batches]

    trainer = ContrastTrainer(args)
    ContrastTrainer._global_gather = staticmethod(lambda x: x)

    def pinned_shuffle_bn(self, x, ema):
        # identity permutation; key encoder runs with train-mode BN
        # (set_bn_train already applied by _train_moco)
        with torch.no_grad():
            k = ema(x, mode=1)
        return k, k

    orig_shuffle = ContrastTrainer._shuffle_bn
    ContrastTrainer._shuffle_bn = pinned_shuffle_bn
    tap = MeterTap()
    tap.install()
    try:
        trainer._train_moco(1, loader, _DDPShim(model), model_ema,
                            contrast, criterion, optimizer)
    finally:
        lutil.AverageMeter.update = _ORIG_METER_UPDATE
        ContrastTrainer._shuffle_bn = orig_shuffle
    # per-step updates (:365-371): data_time, loss, loss_jig, acc,
    # acc_jig, batch_time
    rows = tap.per_step(6)
    out = {"loss": rows[:, 1], "acc": rows[:, 3]}
    out["queue_final"] = contrast.memory.numpy().copy()
    out["ema_head_w_final"] = model_ema.head[0].weight.detach().numpy()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=str, default="1",
                    choices=("1", "2", "seg", "moco"))
    ap.add_argument("--steps", type=int, default=pc.STEPS)
    args_cli = ap.parse_args()

    runner = {"seg": run_reference_seg, "moco": run_reference_moco}.get(
        args_cli.stage)
    if runner is not None:
        out = runner(args_cli.steps)
        pert = runner(args_cli.steps, perturb=1e-6)
    else:
        out = run_reference(int(args_cli.stage), args_cli.steps)
        pert = run_reference(int(args_cli.stage), args_cli.steps,
                             perturb=1e-6)
    for k, v in pert.items():
        if k.startswith("loss") or k == "queue_final":
            out["pert_" + k] = v
    out["steps"] = np.asarray(args_cli.steps)
    path = os.path.join(REPO, "tests", "golden",
                        f"ref_loss_curve_s{args_cli.stage}.npz")
    np.savez_compressed(path, **out)
    for k in sorted(out):
        v = out[k]
        if v.ndim == 1 and v.size == args_cli.steps:
            print(k, np.array2string(v, precision=4))
    print("wrote", path)


if __name__ == "__main__":
    main()
