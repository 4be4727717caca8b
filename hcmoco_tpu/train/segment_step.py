"""Versatility training: joint contrastive + cross-modal supervised
segmentation, plus the per-modality mIoU validator.

Behavioral spec: `pycontrast/learning/segment_trainer.py` —
`train_soft_joint_pri3d` (:617-824): all stage-2 losses weighted by
cmc_loss_weights/other_loss_weights, plus an FCN seg head on the
L2-NORMALIZED linear_merge features with `supervise_type` selecting the
supervision modality (0 = elementwise-max rgbd fusion, 1 = rgb, 2 = depth,
3 = none), seg CE (class-weighted, ignore 255) scaled x10 (:747);
`validate` (:826-934): three heads (rgb / d / rgbd-max) with per-class
IoU/acc from global intersection/union counters; the reference's
pickle-file + barrier cross-rank gather (:116-138) becomes an on-device
psum (implicit in the global-view jit).

NTURGBD-Parsing-4K class weights from main_segmentor.py:76-79.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.config import TrainConfig
from ..contrast.memory import MemoryState, cmc3_forward
from ..contrast.losses import (
    compute_loss_accuracy, soft_pri3d_loss, joints_pri3d_loss,
    cross_subject_scl_loss,
)
from .state import TrainState, make_optimizer
from .contrast_step import _apply, _scl_grouped

# main_segmentor.py:76-79
NTU_SEG_CLASS_WEIGHTS = (
    1.448, 49.234, 49.483, 48.030, 49.247, 49.492, 48.018, 49.704, 50.052,
    49.369, 49.694, 50.090, 49.425, 49.459, 45.846, 47.156, 45.868, 47.197,
    44.167, 42.789, 44.341, 48.632, 48.873, 48.644, 49.004)


def _l2norm_channels(x, eps=1e-12):
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / jnp.maximum(n, eps)


def weighted_seg_ce(logits: jnp.ndarray, labels: jnp.ndarray,
                    class_weights: jnp.ndarray,
                    sample_mask: Optional[jnp.ndarray] = None,
                    ignore_index: int = 255) -> jnp.ndarray:
    """torch CrossEntropyLoss(weight=w, ignore_index=255) semantics:
    sum(w[t] * ce) / sum(w[t]) over non-ignored pixels."""
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    if sample_mask is not None:
        valid = jnp.logical_and(valid, sample_mask[:, None, None] > 0)
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    w = class_weights[safe] * valid.astype(jnp.float32)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-12)


def seg_logits(classifier, cls_params, lm1, lm2, mode: str,
               train: bool, batch_stats, sample_mask=None):
    """Apply the FCN head on normalized features (segment_trainer.py
    :723-744, :908-920). mode in {'rgbd','rgb','d'}.

    sample_mask: the reference only feeds `true_label` frames through the
    classifier in training (:747-769); the head's BN statistics therefore
    exclude unlabeled frames (MaskedBatchNorm)."""
    n1 = _l2norm_channels(lm1)
    n2 = _l2norm_channels(lm2)
    feats = {"rgbd": jnp.maximum(n1, n2), "rgb": n1, "d": n2}[mode]
    return _apply(classifier, cls_params, batch_stats, feats, train=train,
                  sample_mask=sample_mask)


def make_segment_train_step(cfg: TrainConfig, model, classifier,
                            steps_per_epoch: int, scl_groups: int = None,
                            mesh=None):
    """scl_groups: None derives from cfg.scl_groups (0 = one group per
    data-mesh shard = the reference's per-GPU local-batch SCL)."""
    if scl_groups is None:
        scl_groups = cfg.scl_groups
    if scl_groups == 0:
        scl_groups = (dict(mesh.shape).get("data", 1)
                      if mesh is not None else 1)
    tx, lr_fn = make_optimizer(cfg, steps_per_epoch)
    class_weights = jnp.asarray(NTU_SEG_CLASS_WEIGHTS[: cfg.n_class],
                                jnp.float32)
    sup_mode = {0: "rgbd", 1: "rgb", 2: "d", 3: None}[cfg.supervise_type]

    def loss_fn(params, batch_stats, memory, batch, rng):
        rngs = jax.random.split(rng, 3)
        metrics: Dict[str, jnp.ndarray] = {}
        y = batch["index"]
        use_depth = batch["use_depth"]
        use_rgb = batch["use_rgb"]

        model_bs = batch_stats.get("model", {})
        cls_bs = batch_stats.get("classifier", {})
        out, new_model_bs = _apply(
            model, params["model"], model_bs, batch["rgbd"],
            batch["skeleton"], train=True, return_fm=True)

        feats = jnp.stack([out["feat1"], out["feat2"], out["feat3"]])
        # neg_idx / pix_idx: optional pinned samples (reference-parity
        # harness, tools/ref_parity.py --stage seg)
        logits, new_memory = cmc3_forward(
            memory, feats, y, feats, y, rngs[0],
            k=cfg.nce_k, temperature=cfg.nce_t, m=cfg.nce_m,
            neg_idx=batch.get("neg_idx"))
        losses, accs = compute_loss_accuracy(logits, use_depth=use_depth,
                                             use_rgb=use_rgb)
        sp_losses, sp_accs = soft_pri3d_loss(
            rngs[1], out["linear_merge1"], out["linear_merge2"],
            batch["depth_mask"], cfg.pri3d_num_samples_per_image,
            cfg.temperature, use_depth=use_depth,
            sample_ind=batch.get("pix_idx"))
        j_losses, j_accs = joints_pri3d_loss(
            out["linear_merge1"], out["linear_merge2"], out["fm3"],
            batch["joints2d"], batch["joints_vis"], cfg.temperature,
            use_depth=use_depth)
        scl = _scl_grouped(out["linear_merge1"], out["linear_merge2"],
                           batch["joints2d"], use_depth, use_rgb,
                           cfg.temperature, scl_groups)
        loss = (sum(losses) * cfg.cmc_loss_weights
                + (sum(sp_losses) + sum(j_losses) + scl)
                * cfg.other_loss_weights)

        new_cls_bs = cls_bs
        if sup_mode is not None:
            seg_out, new_cls_bs = seg_logits(
                classifier, params["classifier"], out["linear_merge1"],
                out["linear_merge2"], sup_mode, True, cls_bs,
                sample_mask=batch["true_label"])
            loss_seg = weighted_seg_ce(
                seg_out, batch["label"], class_weights,
                sample_mask=batch["true_label"])
            # zero when the batch has no labeled frames (:750-752)
            loss_seg = jnp.where(batch["true_label"].sum() > 0, loss_seg,
                                 0.0)
            loss = loss + loss_seg * 10.0
            metrics["loss_seg"] = loss_seg

        metrics.update(
            loss=loss, loss_scl=scl,
            loss_rgb2depth=sp_losses[0], loss_depth2rgb=sp_losses[1],
            loss_rgb2joint=j_losses[0], loss_d2joint=j_losses[1],
        )
        for n, l, a in zip(("12", "21", "23", "32", "13", "31"), losses,
                           accs):
            metrics[f"nce_loss_{n}"] = l
            metrics[f"nce_acc_{n}"] = a
        new_bs = {"model": new_model_bs, "classifier": new_cls_bs}
        return loss, (new_bs, new_memory, metrics)

    @jax.jit
    def train_step(state: TrainState, batch, rng):
        (_, (new_bs, new_memory, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
            state.params, state.batch_stats, state.memory, batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["learning_rate"] = lr_fn(state.step)
        return state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            opt_state=new_opt, memory=new_memory), metrics

    return train_step


# ---------------------------------------------------------------------------
# validation
# ---------------------------------------------------------------------------


def seg_counts(pred: jnp.ndarray, label: jnp.ndarray, n_class: int,
               ignore_index: int = 255):
    """(intersect, union, pred_area, label_area) histograms
    (intersection_and_union, segment_trainer.py:334-345)."""
    valid = label != ignore_index
    pred = jnp.where(valid, pred, n_class)  # bucket ignored out of range
    label = jnp.where(valid, label, n_class)
    inter = jnp.where(pred == label, pred, n_class)

    def hist(x):
        # int32 per-batch counts; the caller accumulates in float64 on host
        return jnp.bincount(x.reshape(-1), length=n_class + 1)[:n_class]

    ai = hist(inter)
    ap = hist(pred)
    al = hist(label)
    return ai, ap + al - ai, ap, al


def calc_seg_metrics(intersect, union, pred_area, label_area):
    """(aacc, miou, macc, iou, acc) with NaN->0 (calc_metrics :366-375)."""
    aacc = intersect.sum() / jnp.maximum(label_area.sum(), 1e-12)
    iou = jnp.where(union > 0, intersect / jnp.maximum(union, 1e-12), 0.0)
    acc = jnp.where(label_area > 0,
                    intersect / jnp.maximum(label_area, 1e-12), 0.0)
    return aacc, iou.mean(), acc.mean(), iou, acc


def make_validate_fn(cfg: TrainConfig, model, classifier):
    """Returns a jitted per-batch eval producing the three heads' count
    tensors; the caller accumulates across batches."""

    @jax.jit
    def eval_batch(params, batch_stats, batch):
        out, _ = _apply(model, params["model"],
                        batch_stats.get("model", {}), batch["rgbd"],
                        batch["skeleton"], train=False, return_fm=True)
        counts = []
        for mode in ("rgb", "d", "rgbd"):
            logits, _ = seg_logits(
                classifier, params["classifier"], out["linear_merge1"],
                out["linear_merge2"], mode, False,
                batch_stats.get("classifier", {}))
            pred = jnp.argmax(logits, axis=-1)
            counts.append(seg_counts(pred, batch["label"], cfg.n_class))
        return counts

    return eval_batch
