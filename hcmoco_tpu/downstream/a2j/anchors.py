"""A2J anchor machinery: dense anchor grid, soft-argmax post-processing,
smooth-L1 anchor losses.

Behavioral spec: `A2J/anchor.py` — `generate_anchors`/`shift` (:7-42),
`post_process.forward` (:58-82: per-joint softmax over all anchors, weighted
sum of anchor+offset positions and depths), `A2J_loss.forward` (:99-154:
smooth-L1(beta=1) on the anchor-weighted position and the offset-regressed
position x spatialFactor, smooth-L1(beta=3) on depth).

The reference loops over the batch in python (its known perf wart,
SURVEY.md §3.5); here everything is one batched einsum chain on the MXU.
Anchor layout note: anchors are (y, x) pairs — reference column 0 is P_h
(row) and the grid ravel order is W-major (np.meshgrid(shift_h, shift_w)
then ravel), reproduced exactly so exported checkpoints predict
identically.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def generate_anchors(p_h: Optional[np.ndarray] = None,
                     p_w: Optional[np.ndarray] = None) -> np.ndarray:
    if p_h is None:
        p_h = np.array([2, 6, 10, 14])
    if p_w is None:
        p_w = np.array([2, 6, 10, 14])
    anchors = np.zeros((len(p_h) * len(p_w), 2))
    k = 0
    for i in range(len(p_w)):
        for j in range(len(p_h)):
            anchors[k, 1] = p_w[j]
            anchors[k, 0] = p_h[i]
            k += 1
    return anchors


def shift_anchors(shape: Tuple[int, int], stride: int,
                  anchors: np.ndarray) -> np.ndarray:
    """(K*A, 2) dense grid; W-major ravel order matching the reference's
    meshgrid(shift_h, shift_w).T (anchor.py:26-42)."""
    shift_h = np.arange(0, shape[0]) * stride
    shift_w = np.arange(0, shape[1]) * stride
    hh, ww = np.meshgrid(shift_h, shift_w)
    shifts = np.vstack([hh.ravel(), ww.ravel()]).T  # (K, 2)
    a = anchors.shape[0]
    k = shifts.shape[0]
    out = anchors.reshape(1, a, 2) + shifts.reshape(k, 1, 2)
    return out.reshape(k * a, 2)


def post_process(heads, all_anchors: jnp.ndarray,
                 is_3d: bool = True) -> jnp.ndarray:
    """Soft-argmax keypoints: (B, P, 2 or 3).

    heads: classification (B, N, P), regression (B, N, P, 2),
    depth regression (B, N, P) with N = n_anchors.
    """
    if is_3d:
        cls, reg, depth = heads
    else:
        cls, reg = heads
    w = jax.nn.softmax(cls.astype(jnp.float32), axis=1)  # (B, N, P)
    pos = all_anchors[None, :, None, :] + reg.astype(jnp.float32)
    xy = jnp.einsum("bnp,bnpc->bpc", w, pos)
    if not is_3d:
        return xy
    d = jnp.einsum("bnp,bnp->bp", w, depth.astype(jnp.float32))
    return jnp.concatenate([xy, d[..., None]], axis=-1)


def _smooth_l1(diff: jnp.ndarray, beta: float) -> jnp.ndarray:
    """torch-style smooth-L1 as written in the reference
    (anchor.py:126-131): 0.5*(1/beta)*d^2 if d<=beta else d - 0.5/(1/beta).
    NOTE the else-branch uses `d - 0.5*beta`-equivalent only for beta=1;
    for beta=3 the reference literally computes d - 0.5/(1/3) = d - 1.5,
    replicated via the same formula."""
    inv = 1.0 / beta
    return jnp.where(diff <= beta, 0.5 * inv * diff * diff,
                     diff - 0.5 / inv)


def a2j_loss(heads, annotations: jnp.ndarray, all_anchors: jnp.ndarray,
             spatial_factor: float = 0.5,
             is_3d: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(anchor_cls_loss, regression_loss), each scalar.

    annotations: (B, P, 3) = (row, col, depth) targets in crop pixels.
    Reference: A2J_loss.forward (anchor.py:99-154), vectorized over batch.
    """
    if is_3d:
        cls, reg, depthreg = heads
    else:
        cls, reg = heads
    cls = cls.astype(jnp.float32)
    reg = reg.astype(jnp.float32)
    w = jax.nn.softmax(cls, axis=1)  # (B, N, P)
    gt_xy = annotations[..., :2].astype(jnp.float32)  # (B, P, 2)

    # "anchor loss": weighted mean anchor position vs gt
    anchor_pos = jnp.einsum("bnp,nc->bpc", w, all_anchors)
    anchor_diff = jnp.abs(gt_xy - anchor_pos)
    anchor_loss = _smooth_l1(anchor_diff, 1.0).mean(axis=(1, 2))

    # offset-regressed position vs gt, x spatialFactor
    pos = all_anchors[None, :, None, :] + reg
    reg_xy = jnp.einsum("bnp,bnpc->bpc", w, pos)
    reg_loss = _smooth_l1(jnp.abs(gt_xy - reg_xy), 1.0).mean(
        axis=(1, 2)) * spatial_factor

    if is_3d:
        gt_d = annotations[..., 2].astype(jnp.float32)
        d_pred = jnp.einsum("bnp,bnp->bp", w, depthreg.astype(jnp.float32))
        reg_loss = reg_loss + _smooth_l1(jnp.abs(gt_d - d_pred), 3.0).mean(
            axis=1)

    return anchor_loss.mean(), reg_loss.mean()
