"""Shared deterministic generators for the reference loss-curve parity
harness (tools/ref_parity.py writes the golden; tests/test_ref_parity.py
replays our side).  Everything both frameworks must agree on bit-for-bit is
generated here from pinned seeds: model weights (crc32-per-key synth, same
scheme as tests/test_forward_parity.py), memory banks, batches, and the
negative-sample indices that replace the reference's multinomial draw.

Scale: HRNet-W18 flagship (CMC3HRNetSGCNSingleHead), tiny crop/batch so the
reference torch loop runs in seconds on this 1-core CPU host.
"""

import zlib

import numpy as np

# pinned tiny-scale hyperparameters (both sides read these)
CROP = 64
BSZ = 6
STEPS = 12
N_DATA = 128
NCE_K = 64
NCE_T = 0.07
NCE_M = 0.5
FEAT_DIM = 128
N_JOINTS = 16
LR = 0.03
MOMENTUM = 0.9
WEIGHT_DECAY = 1e-4
WEIGHT_SEED = 11
BANK_SEED = 12
BATCH_SEED = 13


def synth_state_dict(keys_shapes, seed=WEIGHT_SEED):
    """Deterministic per-key weights: RandomState seeded by crc32(key)^seed.
    Same rules as tests/test_forward_parity.py so either framework can
    materialize the identical reference state dict without storing 19M
    params."""
    sd = {}
    for k, shape in keys_shapes:
        r = np.random.RandomState(
            (zlib.crc32(k.encode()) ^ seed) % (2 ** 31 - 1))
        if k.endswith("running_var"):
            v = r.rand(*shape) * 0.5 + 0.75
        elif k.endswith("running_mean"):
            v = r.randn(*shape) * 0.1
        elif k.endswith("num_batches_tracked"):
            v = np.zeros(shape)
        elif len(shape) == 1 and k.endswith("weight"):
            v = r.rand(*shape) + 0.5
        elif len(shape) == 1:
            v = r.randn(*shape) * 0.1
        else:
            v = r.randn(*shape) * 0.05
        sd[k] = v.astype(np.float32)
    return sd


def read_keys_file(path):
    keys_shapes = []
    with open(path) as f:
        for line in f:
            k, _, shape = line.rstrip("\n").partition("\t")
            keys_shapes.append(
                (k, tuple(int(s) for s in shape.split(",") if s)))
    return keys_shapes


def synth_banks(n_data=N_DATA, dim=FEAT_DIM, seed=BANK_SEED):
    """(3, n_data, dim) rows L2-normalized — replaces CMCMem3's randn init
    (mem_bank.py:164-170) with a pinned one."""
    r = np.random.RandomState(seed)
    banks = r.randn(3, n_data, dim).astype(np.float32)
    banks /= np.maximum(
        np.sqrt((banks ** 2).sum(-1, keepdims=True)), 1e-12)
    return banks


PIX_SEED = 17


def pinned_pixel_indices(depth_mask, crop, num_samples, rng):
    """Uniform over valid pixels of the nearest-/4-downsampled depth mask —
    the distribution the reference's soft-pri3d multinomial draws from
    (contrast_trainer.py:674-685)."""
    h = crop // 4
    valid = depth_mask[:, ::4, ::4].reshape(depth_mask.shape[0], h * h)
    out = np.zeros((depth_mask.shape[0], num_samples), np.int64)
    for b in range(depth_mask.shape[0]):
        cand = np.nonzero(valid[b] > 0)[0]
        assert cand.size > 0
        out[b] = rng.choice(cand, num_samples, replace=True)
    return out


def stage2_pixel_indices(batches, num_samples=8, crop=CROP):
    """Per-step pinned soft-pri3d pixel samples for `batches`."""
    rng = np.random.default_rng(PIX_SEED)
    return [pinned_pixel_indices(b["depth_mask"], crop, num_samples, rng)
            for b in batches]


MOCO_K = 32
MOCO_ALPHA = 0.99
# crop 64 leaves resnet50's layer4 at 1x1 spatial: train-mode BN statistics
# over 4-6 values amplify conv-backend fp32 roundoff ~90x per stage (torch
# CPU conv vs XLA conv differ at ~2e-4 after layer1) and step-0 parity is
# unreachable.  128 -> layer4 4x4, amplification drops to ~1e-2 absolute.
MOCO_CROP = 128
QUEUE_SEED = 14
SEG_SEED = 15


def synth_moco_queue(k=MOCO_K, dim=FEAT_DIM, seed=QUEUE_SEED):
    """(k, dim) L2-normalized rows — pinned replacement for RGBMoCo's
    `F.normalize(torch.randn(K, n_dim))` (mem_moco.py:56-58)."""
    r = np.random.RandomState(seed)
    q = r.randn(k, dim).astype(np.float32)
    return q / np.maximum(np.sqrt((q ** 2).sum(-1, keepdims=True)), 1e-12)


def synth_moco_batches(steps=STEPS, bsz=BSZ, crop=MOCO_CROP,
                       seed=BATCH_SEED):
    """Two 3-channel crops stacked on channels (the moco loader layout,
    contrast_trainer.py:288-293)."""
    rng = np.random.default_rng(seed)
    return [{
        "rgbd": (rng.standard_normal((bsz, crop, crop, 6)) * 0.5)
        .astype(np.float32),
        "index": rng.choice(1024, bsz, replace=False).astype(np.int64),
    } for _ in range(steps)]


def synth_seg_batches(steps=STEPS, bsz=BSZ, crop=CROP, n_joints=N_JOINTS,
                      n_data=N_DATA, k=NCE_K, n_class=25):
    """Versatility-trainer batches: the stage-2 fields + seg label
    (255-ignore regions) + true_label with >=2 labeled frames per batch so
    the seg loss fires every step (segment_trainer.py:747-769)."""
    batches = synth_batches(steps=steps, bsz=bsz, crop=crop,
                            n_joints=n_joints, n_data=n_data, k=k,
                            stage2=True)
    rng = np.random.default_rng(SEG_SEED)
    for b in batches:
        label = rng.integers(0, n_class, (bsz, crop, crop)).astype(np.int64)
        ignore = rng.random((bsz, crop, crop)) < 0.15
        label[ignore] = 255
        b["label"] = label
        tl = (rng.random(bsz) < 0.5).astype(np.int64)
        tl[:2] = 1
        b["true_label"] = tl
    return batches


def synth_batches(steps=STEPS, bsz=BSZ, crop=CROP, n_joints=N_JOINTS,
                  n_data=N_DATA, k=NCE_K, seed=BATCH_SEED, stage2=False):
    """Per-step batch dicts (numpy, NHWC) with pinned negative indices.

    Field layout matches the reference NTUMPII tuple consumed by
    _train_mem_skeleton3d / _train_bank_joints_pri3d_cmc3
    (contrast_trainer.py:532-640, :894-1039): rgbd float, index, skeleton,
    use_depth(=true_depth, data[6]), depth_mask(data[7]), use_rgb(data[11]),
    and for stage 2 joints2d(data[4]), joints_vis(data[5]), scale(data[8]).
    """
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(steps):
        index = rng.choice(n_data, bsz, replace=False).astype(np.int64)
        neg = rng.integers(0, n_data, (bsz, k + 1)).astype(np.int64)
        neg[:, 0] = index
        b = {
            "rgbd": (rng.standard_normal((bsz, crop, crop, 6)) * 0.5)
            .astype(np.float32),
            "index": index,
            "skeleton": rng.uniform(-1, 1, (bsz, n_joints, 2))
            .astype(np.float32),
            "use_depth": (rng.random(bsz) < 0.75).astype(np.int64),
            "use_rgb": (rng.random(bsz) < 0.9).astype(np.int64),
            "depth_mask": (rng.random((bsz, crop, crop)) < 0.7)
            .astype(np.float32),
            "neg_idx": neg,
        }
        if stage2:
            # original-resolution (row, col) joint pixel coords + vis,
            # same conventions as datasets/dataset.py's 2D joints
            b["joints2d"] = rng.uniform(
                4, crop - 4, (bsz, n_joints, 2)).astype(np.float32)
            b["joints_vis"] = (rng.random((bsz, n_joints)) < 0.9).astype(
                np.int64)
            b["scale"] = np.ones(bsz, np.float32)
        batches.append(b)
    return batches
