"""Violation-rate measurement for the windowed ball query.

ball_query_windowed's fallback predicate differs from window_group's:
it fires when ANY in-radius point (not just a returned neighbor) lies
outside a center tile's window, and the `lax.cond` is whole-batch — at
bs64 even a small per-sample rate collapses the fast path.  This tool
runs the real depth2pts -> FPS(sorted) -> per-level pipeline on
representative smooth-depth batches and reports, per SA level x scale,
the per-SAMPLE violation probability under the exact kernel geometry
(chunk_m=128 center tiles, w rounded to 64 lanes), split valid vs
zero-cloud (the latter is exempted by the rowuni predicate).

Run: PYTHONPATH=. python tools/measure_bq_viol.py [batch=8] [reps=4]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/hcmoco_jax_cache")

import jax.numpy as jnp  # noqa: E402

from hcmoco_tpu.data.synthetic import synthetic_contrast_batch  # noqa: E402
from hcmoco_tpu.models.pointnet2_model import (  # noqa: E402
    depth2pts, NPOINTS, RADIUS, NSAMPLE, SA_WINDOWS)
from hcmoco_tpu.ops.point_ops import (  # noqa: E402
    furthest_point_sample, gather_points)

CHUNK_M = 128


def viol_per_sample(xyz: np.ndarray, centers: np.ndarray, radius: float,
                    window: int) -> np.ndarray:
    """(B,) bool: any in-radius point outside its center tile's window.
    Geometry mirrors ball_query_windowed: stride = n//m, cms =
    CHUNK_M*stride, w = ceil64(window), tile j covers real indices
    [j*cms - w, j*cms + cms + w)."""
    b, n, _ = xyz.shape
    m = centers.shape[1]
    stride = n // m
    cms = CHUNK_M * stride
    w = -(-window // 64) * 64
    tw = cms + 2 * w
    if tw >= n:
        return np.zeros(b, bool)  # kernel statically falls back (no loss)
    out = np.zeros(b, bool)
    r2 = radius * radius
    for j in range(m // CHUNK_M):
        lo, hi = j * cms - w, j * cms + cms + w
        c = centers[:, j * CHUNK_M:(j + 1) * CHUNK_M]  # (B, CM, 3)
        d2 = ((c[:, :, None, :] - xyz[:, None, :, :]) ** 2).sum(-1)
        hit = d2 < r2
        idx = np.arange(n)[None, None, :]
        outside = (idx < lo) | (idx >= hi)
        out |= (hit & outside).any((1, 2))
    return out


def main() -> None:
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rng = np.random.default_rng(0)
    counts: dict = {}
    totals: dict = {}
    for rep in range(reps):
        batch = synthetic_contrast_batch(rng, b, size=320, num_joints=16,
                                         n_data=4096)
        depth = jnp.asarray(batch["rgbd"][..., 3])
        sampled, _, _, _ = depth2pts(
            depth, jnp.asarray(batch["depth_mask"]),
            jnp.asarray(batch["grid_xy"]), 320.0, 320.0,
            jnp.asarray(batch["depth_mean"]), jax.random.PRNGKey(rep), 4096)
        xyz = np.asarray(sampled)
        use_depth = np.asarray(batch["use_depth"]) > 0
        for lvl in range(4):
            n = xyz.shape[1]
            m = NPOINTS[lvl] if lvl > 0 else n
            if m != n:
                fidx = jnp.sort(furthest_point_sample(
                    jnp.asarray(xyz), m, impl="xla"), axis=-1)
                cx = np.asarray(gather_points(jnp.asarray(xyz), fidx))
            else:
                cx = xyz
            for si, (r, s) in enumerate(zip(RADIUS[lvl], NSAMPLE[lvl])):
                win = SA_WINDOWS[lvl][si] if si < len(SA_WINDOWS[lvl]) else 0
                v = viol_per_sample(xyz, cx, r, win)
                key = (lvl, si, r, win)
                counts[key] = counts.get(key, 0) + int((v & use_depth).sum())
                totals[key] = totals.get(key, 0) + int(use_depth.sum())
            if m != n:
                xyz = cx
    for (lvl, si, r, win), c in sorted(counts.items()):
        t = totals[(lvl, si, r, win)]
        p = c / max(t, 1)
        batch_fb = 1 - (1 - p) ** 64
        print(f"sa{lvl} scale{si} r={r} W={win}: per-sample viol "
              f"{c}/{t} = {p:.3f}  -> P(batch64 fallback) ~ {batch_fb:.3f}")


if __name__ == "__main__":
    main()
