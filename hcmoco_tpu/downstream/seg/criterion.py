"""Segmentation criteria.

Behavioral spec: `HRNet-Semantic-Segmentation/lib/core/criterion.py` —
`CrossEntropy` (:11-27, logits bilinearly upsampled to the label size,
class-weighted CE with ignore_index) and `OhemCrossEntropy` (:29-57,
hard-pixel mining: keep pixels whose predicted target-class prob is below
max(threshold, prob of the min_kept-th hardest pixel)).

OHEM under jit: the reference sorts all valid pixels; we use a top_k of the
negated probabilities (equivalent selection) with masked means — static
shapes, no boolean indexing.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _upsample_logits(logits: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    if logits.shape[1] == h and logits.shape[2] == w:
        return logits
    return jax.image.resize(
        logits.astype(jnp.float32),
        (logits.shape[0], h, w, logits.shape[3]), method="bilinear")


def cross_entropy_seg(logits: jnp.ndarray, labels: jnp.ndarray,
                      class_weights: Optional[jnp.ndarray] = None,
                      ignore_label: int = 255) -> jnp.ndarray:
    """NHWC logits, (B, H, W) int labels."""
    logits = _upsample_logits(logits, labels.shape[1], labels.shape[2])
    valid = labels != ignore_label
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if class_weights is not None:
        w = class_weights[safe] * valid.astype(jnp.float32)
    else:
        w = valid.astype(jnp.float32)
    return jnp.sum(ce * w) / jnp.maximum(w.sum(), 1e-12)


def ohem_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                       class_weights: Optional[jnp.ndarray] = None,
                       ignore_label: int = 255, thres: float = 0.7,
                       min_kept: int = 100000) -> jnp.ndarray:
    logits = _upsample_logits(logits, labels.shape[1], labels.shape[2])
    valid = (labels != ignore_label).reshape(-1)
    safe = jnp.where(labels != ignore_label, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if class_weights is not None:
        ce = ce * class_weights[safe]
    ce = ce.reshape(-1)

    prob = jnp.exp(
        jnp.take_along_axis(logp, safe[..., None], axis=-1))[..., 0]
    prob = prob.reshape(-1)
    prob = jnp.where(valid, prob, jnp.inf)  # invalid never selected

    n = prob.shape[0]
    k = min(min_kept, n - 1)
    # prob of the k-th hardest valid pixel (ascending sort position k)
    kth = -jax.lax.top_k(-prob, k + 1)[0][-1]
    threshold = jnp.maximum(kth, thres)
    keep = jnp.logical_and(valid, prob < threshold)
    return jnp.sum(ce * keep) / jnp.maximum(keep.sum(), 1.0)


def poly_lr(base_lr: float, cur_iter, max_iter: int,
            power: float = 0.9):
    """lib/utils/utils.py:142-146."""
    return base_lr * (1.0 - jnp.asarray(cur_iter, jnp.float32) /
                      max_iter) ** power


def confusion_matrix(pred: jnp.ndarray, label: jnp.ndarray, n_class: int,
                     ignore_label: int = 255) -> jnp.ndarray:
    """(n_class, n_class) confusion counts (utils.py:117-140 semantics:
    rows = gt, cols = pred)."""
    valid = label != ignore_label
    g = jnp.where(valid, label, n_class)
    p = jnp.where(valid, pred, 0)
    idx = g * (n_class + 1) + jnp.where(valid, p, n_class)
    flat = jnp.bincount(idx.reshape(-1),
                        length=(n_class + 1) * (n_class + 1))
    return flat.reshape(n_class + 1, n_class + 1)[:n_class, :n_class]


def miou_from_confusion(conf: jnp.ndarray):
    conf = conf.astype(jnp.float32)
    tp = jnp.diagonal(conf)
    pos = conf.sum(1)  # gt
    res = conf.sum(0)  # pred
    iou = tp / jnp.maximum(pos + res - tp, 1e-12)
    iou = jnp.where(pos + res - tp > 0, iou, 0.0)
    return iou.mean(), iou
