"""HCMoCo contrastive losses as pure jittable functions.

Behavioral spec: the loss methods of `pycontrast/learning/contrast_trainer.py`
  * `_compute_loss_accuracy` (:212-253) — modality-masked CE over the 6
    sample-level NCE logit matrices
  * `_compute_soft_pri3d_loss_accuracy` (:642-723) — dense intra-sample
    soft-target contrastive (pixel-distance softmax targets)
  * `_compute_joints_pri3d_loss_accuracy` (:744-828) — sparse joint-level
    InfoNCE between image feature maps and the SemGCN joint embeddings
  * `_compute_cross_subject_joints_pri3d_loss` (:830-892) — structure-aware
    cross-sample joint contrastive (SCL)
  * `_gaussian_joint_pooling` (:725-742)

Under jit the reference's data-dependent python branches
(`use_depth.sum()==0` early-returns, boolean-mask row filtering) become
masked arithmetic: weighted sums with clamped denominators, which reproduce
both branches exactly (the reference clamps zero denominators to 1 the same
way, :806-810,888-890).

All feature maps are NHWC.  The joint-index convention follows the
reference: `original_joints2d[..., 0]` is the row (y) and `[..., 1]` the
column (x); flat index = row * h + col after //4 downsample and clamping.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..models.heads import gaussian_blur_nhwc


def _l2norm(x, axis=-1, eps=1e-12):
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """mean of x over rows where mask, 0 if mask empty."""
    mask = mask.astype(jnp.float32)
    denom = jnp.maximum(mask.sum(), 1.0)
    return jnp.sum(x * mask) / denom * jnp.sign(mask.sum())


def per_sample_nce(logits: jnp.ndarray):
    """Per-sample CE-to-class-0 + top1-correct indicator (labels are always
    0, mem_bank.py:80,137,193).  Ties at the max count as correct, matching
    torch argmax's first-index tie-break with the positive in column 0."""
    logits = logits.astype(jnp.float32)
    ce = jax.nn.logsumexp(logits, axis=-1) - logits[:, 0]
    correct = (jnp.argmax(logits, axis=-1) == 0).astype(jnp.float32)
    return ce, correct


def nce_loss_and_acc(logits: jnp.ndarray,
                     row_mask: Optional[jnp.ndarray] = None):
    """CE-to-class-0 with optional row masking; returns (loss, top1-acc)."""
    ce, correct = per_sample_nce(logits)
    if row_mask is None:
        return ce.mean(), correct.mean()
    return _masked_mean(ce, row_mask), _masked_mean(correct, row_mask)


def masked_six_way(
    per_sample: Sequence,
    use_depth: Optional[jnp.ndarray] = None,
    use_rgb: Optional[jnp.ndarray] = None,
):
    """Modality masking over six per-sample (ce, correct) pairs
    (contrast_trainer.py:212-253); order (12, 21, 23, 32, 13, 31).

    With `use_depth` only, the first four pairs (those touching depth) are
    masked to depth-valid rows; the last two (rgb<->skeleton) are unmasked.
    With both masks, all six are restricted to rows where both modalities
    exist; when that set is empty the first four are 0 and the last two fall
    back to the full batch (reference early-returns, :226-239)."""
    losses, accs = [], []
    if use_rgb is not None:
        assert use_depth is not None
        together = jnp.logical_and(use_depth == 1, use_rgb == 1)
        any_together = together.sum() > 0
        for i, (ce, cor) in enumerate(per_sample):
            l_m, a_m = _masked_mean(ce, together), _masked_mean(cor, together)
            l_u, a_u = ce.mean(), cor.mean()
            if i >= 4:
                l = jnp.where(any_together, l_m, l_u)
                a = jnp.where(any_together, a_m, a_u)
            else:
                l, a = l_m, a_m
            losses.append(l)
            accs.append(a)
    elif use_depth is not None:
        depth_ok = use_depth == 1
        for i, (ce, cor) in enumerate(per_sample):
            if i <= 3:
                losses.append(_masked_mean(ce, depth_ok))
                accs.append(_masked_mean(cor, depth_ok))
            else:
                losses.append(ce.mean())
                accs.append(cor.mean())
    else:
        for ce, cor in per_sample:
            losses.append(ce.mean())
            accs.append(cor.mean())
    return losses, accs


def compute_loss_accuracy(
    logits: Sequence[jnp.ndarray],
    use_depth: Optional[jnp.ndarray] = None,
    use_rgb: Optional[jnp.ndarray] = None,
):
    """Masked N-way NCE from logit matrices (contrast_trainer.py:212-253)."""
    return masked_six_way([per_sample_nce(lg) for lg in logits],
                          use_depth, use_rgb)


# ---------------------------------------------------------------------------
# Dense soft-Pri3D loss
# ---------------------------------------------------------------------------


def soft_pri3d_loss(
    rng: jax.Array,
    merge1: jnp.ndarray,  # (B, h, w, C) rgb dense features (linear_merge1)
    merge2: jnp.ndarray,  # (B, h, w, C) depth dense features
    depth_mask: jnp.ndarray,  # (B, H, W) valid-depth mask (input res)
    num_samples: int,
    temperature: float,
    use_depth: Optional[jnp.ndarray] = None,
    sample_ind: Optional[jnp.ndarray] = None,  # (B, S) override for tests
):
    """Dense intra-sample contrastive with pixel-distance soft targets
    (contrast_trainer.py:642-723).

    Per image: multinomially sample `num_samples` valid-depth pixels (with
    replacement), L2-normalize the channel vectors at those pixels in both
    modalities, form the (S, S) cross-modal similarity matrices, and
    cross-entropy them against soft targets softmax(-pixel distance) along
    the "key" axis (dim -2).  Images with no valid depth (or masked out by
    `use_depth`) contribute 0.
    """
    b, h, w, c = merge1.shape
    # nearest-resize the mask to the feature resolution (reference uses
    # F.interpolate(mode='nearest') on the full-res mask, :678-680)
    mask_small = jax.image.resize(
        depth_mask.astype(jnp.float32), (b, h, w), method="nearest"
    ).reshape(b, h * w)

    valid_count = mask_small.sum(-1)
    # NOTE: the reference uses `use_depth` ONLY for a whole-batch early
    # return (contrast_trainer.py:663-665); per-image filtering is purely
    # on depth-mask validity (:676-683).  No-depth images with nonempty
    # masks DO contribute — replicated exactly (stage-2 parity golden).
    img_ok = valid_count > 0
    batch_ok = (use_depth.sum() > 0 if use_depth is not None
                else jnp.asarray(True))

    if sample_ind is None:
        # categorical sampling ~ torch multinomial(replacement=True)
        logp = jnp.where(mask_small > 0, 0.0, -jnp.inf)
        safe_logp = jnp.where(img_ok[:, None], logp, 0.0)  # uniform fallback
        sample_ind = jax.random.categorical(
            rng, safe_logp[:, None, :], axis=-1,
            shape=(b, num_samples),
        )  # (B, S)

    f1 = merge1.reshape(b, h * w, c).astype(jnp.float32)
    f2 = merge2.reshape(b, h * w, c).astype(jnp.float32)
    g1 = jnp.take_along_axis(f1, sample_ind[:, :, None], axis=1)  # (B,S,C)
    g2 = jnp.take_along_axis(f2, sample_ind[:, :, None], axis=1)
    g1 = _l2norm(g1, axis=-1)
    g2 = _l2norm(g2, axis=-1)

    # logits[b, i, j] = <key_i, query_j>; reference: matmul(m2^T, m1) where
    # features are (B, C, S) -> rgb2depth[b,i,j] = <g2_i, g1_j>
    rgb2depth = jnp.einsum("bic,bjc->bij", g2, g1) / temperature
    depth2rgb = jnp.einsum("bic,bjc->bij", g1, g2) / temperature

    yx = jnp.stack([sample_ind // w, sample_ind % w], axis=-1).astype(
        jnp.float32)  # (B,S,2)
    dist = jnp.sqrt(
        jnp.sum((yx[:, :, None, :] - yx[:, None, :, :]) ** 2, axis=-1))
    soft_target = jax.nn.softmax(-dist, axis=1)  # over key axis (dim -2)

    def soft_ce(lg):
        logsoft = jax.nn.log_softmax(lg, axis=1)
        per_img = -(soft_target * logsoft).sum(axis=1).mean(axis=-1)  # (B,)
        return _masked_mean(per_img, img_ok) * batch_ok

    losses = [soft_ce(rgb2depth), soft_ce(depth2rgb)]

    target = jnp.arange(num_samples)[None, :]
    def acc(lg):
        pred = jnp.argmax(lg, axis=1)
        per_img = (pred == target).mean(axis=-1)
        return _masked_mean(per_img, img_ok) * batch_ok

    return losses, [acc(rgb2depth), acc(depth2rgb)]


# ---------------------------------------------------------------------------
# Sparse joint-level loss
# ---------------------------------------------------------------------------


def gather_joint_features(feat: jnp.ndarray,
                          joints2d: jnp.ndarray) -> jnp.ndarray:
    """Gather per-joint feature vectors at joints//4 on a stride-4 NHWC map
    (contrast_trainer.py:755-763).  joints2d: (B, J, 2) full-res (row, col).
    Returns (B, J, C)."""
    b, h, w, c = feat.shape
    j = (joints2d // 4).astype(jnp.int32)
    j = jnp.clip(j, 0, h - 1)  # reference clamps both coords to [0, h)
    flat = j[..., 0] * h + j[..., 1]
    return jnp.take_along_axis(
        feat.reshape(b, h * w, c), flat[:, :, None], axis=1)


def gaussian_joint_pooling(feat: jnp.ndarray,
                           joints2d: jnp.ndarray) -> jnp.ndarray:
    """Gaussian-blur the map (5x5, sigma 1, reflect pad) then gather joint
    features (`_gaussian_joint_pooling`, contrast_trainer.py:725-742)."""
    return gather_joint_features(gaussian_blur_nhwc(feat, 5, 1.0), joints2d)


def _masked_ce(logits: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """torch CrossEntropyLoss(ignore_index=-100, reduction='mean') on
    (B, J_keys, J_pos) logits with target[b, j] = j where valid, averaged
    over all valid (b, j) positions."""
    logits = logits.astype(jnp.float32)
    j = logits.shape[-1]
    # CE over the class dim (axis 1): for position p, class = p
    logsoft = jax.nn.log_softmax(logits, axis=1)
    diag = jnp.diagonal(logsoft, axis1=1, axis2=2)  # (B, J)
    ce = -diag
    v = valid.astype(jnp.float32)
    return jnp.sum(ce * v) / jnp.maximum(v.sum(), 1.0)


def joints_pri3d_loss(
    rgb_map: jnp.ndarray,  # (B, h, w, C) linear_merge1
    d_map: jnp.ndarray,  # (B, h, w, C) linear_merge2
    joint_feat: jnp.ndarray,  # (B, J, C) SemGCN output (_feat3)
    joints2d: jnp.ndarray,  # (B, J, 2) full-res (row, col)
    joints_vis: jnp.ndarray,  # (B, J) bool
    temperature: float,
    use_depth: Optional[jnp.ndarray] = None,
):
    """Sparse joint InfoNCE (contrast_trainer.py:744-828).

    rgb2joints_logits[b, i, j] = <joint_i, rgb_joint_feat_j>/T, CE with
    class=position over visible joints; depth side additionally masks
    samples without real depth."""
    rgb_j = _l2norm(gather_joint_features(rgb_map, joints2d), axis=-1)
    d_j = _l2norm(gather_joint_features(d_map, joints2d), axis=-1)
    q = _l2norm(joint_feat.astype(jnp.float32), axis=-1)

    rgb_logits = jnp.einsum("bic,bjc->bij", q, rgb_j) / temperature
    d_logits = jnp.einsum("bic,bjc->bij", q, d_j) / temperature

    vis = joints_vis.astype(bool)
    d_vis = vis
    if use_depth is not None:
        d_vis = jnp.logical_and(vis, (use_depth == 1)[:, None])

    losses = [_masked_ce(rgb_logits, vis), _masked_ce(d_logits, d_vis)]

    def acc(lg, valid):
        pred = jnp.argmax(lg, axis=1)  # (B, J)
        tgt = jnp.arange(lg.shape[-1])[None, :]
        hit = (pred == tgt).astype(jnp.float32) * valid
        denom = jnp.maximum(valid.sum(-1), 1.0)
        per_img = hit.sum(-1) / denom
        img_ok = valid.sum(-1) > 0
        return _masked_mean(per_img, img_ok)

    return losses, [acc(rgb_logits, vis.astype(jnp.float32)),
                    acc(d_logits, d_vis.astype(jnp.float32))]


# ---------------------------------------------------------------------------
# Cross-subject structure-aware loss (SCL)
# ---------------------------------------------------------------------------


def cross_subject_scl_loss(
    rgb_map: jnp.ndarray,  # (B, h, w, C)
    d_map: jnp.ndarray,  # (B, h, w, C)
    joints2d: jnp.ndarray,  # (B, J, 2)
    use_depth: jnp.ndarray,  # (B,)
    use_rgb: jnp.ndarray,  # (B,)
    temperature: float,
):
    """Structure-aware cross-sample contrastive
    (contrast_trainer.py:830-892): stack rgb & depth joint features of the
    whole batch (2*B*J, C); positives = same joint id across subjects and
    modalities (diagonal removed); rows/cols of missing modalities zeroed;
    loss = mean over rows of -mean_{positives} log-softmax."""
    b, _, _, c = rgb_map.shape
    j = joints2d.shape[1]
    rgb_j = _l2norm(gather_joint_features(rgb_map, joints2d), axis=-1)
    d_j = _l2norm(gather_joint_features(d_map, joints2d), axis=-1)
    cat = jnp.concatenate(
        [rgb_j.reshape(b * j, c), d_j.reshape(b * j, c)], axis=0)
    n = 2 * b * j
    logits = (cat @ cat.T) / temperature
    logsoft = jax.nn.log_softmax(logits, axis=1)

    joint_id = jnp.tile(jnp.arange(j), 2 * b)
    pos = (joint_id[:, None] == joint_id[None, :]).astype(jnp.float32)
    pos = pos * (1.0 - jnp.eye(n, dtype=jnp.float32))

    ok = jnp.concatenate([
        jnp.repeat(use_rgb == 1, j), jnp.repeat(use_depth == 1, j)
    ]).astype(jnp.float32)
    pos = pos * ok[:, None] * ok[None, :]

    pos_sum = jnp.maximum(pos.sum(-1), 1.0)
    row_loss = -(logsoft * pos).sum(-1) / pos_sum
    # reference early-returns 0 when no sample has depth (:846-847)
    return jnp.where(use_depth.sum() > 0, row_loss.mean(), 0.0)
