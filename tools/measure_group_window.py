"""Measure ball-query neighbor locality in the raster-sorted point order.

With depth2pts emitting raster-ordered samples (sorted inverse-CDF draws,
models/pointnet2_model.py::depth2pts) the question is whether SA-MSG
neighbor indices stay within a bounded window of their center's table
position — the feasibility condition for replacing the grouping gather /
backward scatter (48% of the HRNetPN step, PERF.md round-3 profile) with
windowed one-hot matmuls on the MXU.

Prints, per SA level x scale, quantiles of |idx - center_pos| and the
fraction of entries outside windows W in {128, 256, 512, 1024}, for
centers in FPS visit order AND re-sorted ascending (locality at L1+
requires sorting the FPS-selected indices; consumers are permutation-
equivariant so this is free).

Run: PYTHONPATH=. python tools/measure_group_window.py [batch=4]
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/hcmoco_jax_cache")

import jax.numpy as jnp  # noqa: E402

from hcmoco_tpu.data.synthetic import synthetic_contrast_batch  # noqa: E402
from hcmoco_tpu.models.pointnet2_model import (  # noqa: E402
    depth2pts, NPOINTS, RADIUS, NSAMPLE)
from hcmoco_tpu.ops.point_ops import (  # noqa: E402
    furthest_point_sample, ball_query, gather_points)

WINDOWS = (128, 256, 512, 1024)


def stats(rel: np.ndarray, use_depth: np.ndarray, tag: str) -> None:
    for name, sel in (("valid", use_depth > 0), ("zerocloud", use_depth == 0)):
        if not sel.any():
            continue
        a = np.abs(rel[sel].reshape(-1))
        qs = np.percentile(a, [50, 95, 99, 99.9, 100])
        viol = "  ".join(
            f"W{w}:{float((a > w).mean()):.2e}" for w in WINDOWS)
        print(f"{tag:30s} [{name:9s}] p50={qs[0]:6.0f} p95={qs[1]:6.0f} "
              f"p99={qs[2]:6.0f} p99.9={qs[3]:6.0f} max={qs[4]:6.0f}  "
              f"out: {viol}")


def main() -> None:
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    batch = synthetic_contrast_batch(
        np.random.default_rng(0), b, size=320, num_joints=16, n_data=4096)
    depth = jnp.asarray(batch["rgbd"][..., 3])
    sampled, _, _, _ = depth2pts(
        depth, jnp.asarray(batch["depth_mask"]),
        jnp.asarray(batch["grid_xy"]), 320.0, 320.0,
        jnp.asarray(batch["depth_mean"]), jax.random.PRNGKey(0), 4096)
    xyz = sampled  # (B, 4096, 3) raster-sorted

    for lvl in range(4):
        n = xyz.shape[1]
        m = NPOINTS[lvl] if lvl > 0 else n  # sa0 keeps all (identity FPS)
        if m == n:
            centers = {"identity": (jnp.arange(n)[None, :].repeat(b, 0),
                                    xyz)}
        else:
            fidx = furthest_point_sample(xyz, m, impl="xla")
            centers = {
                "fps-order": (fidx, gather_points(xyz, fidx)),
                "fps-sorted": (jnp.sort(fidx, axis=-1),
                               gather_points(xyz, jnp.sort(fidx, axis=-1))),
            }
        use_depth = np.asarray(batch["use_depth"])
        for cname, (cpos, cxyz) in centers.items():
            for r, s in zip(RADIUS[lvl], NSAMPLE[lvl]):
                gidx = ball_query(xyz, cxyz, r, s, impl="xla")
                rel = (np.asarray(gidx)
                       - np.asarray(cpos)[:, :, None].astype(np.int64))
                stats(rel, use_depth, f"sa{lvl} r={r} s={s} [{cname}]")
                if cname != "fps-order":
                    # kernel-relevant: offset from the TILE base (first
                    # center position in a TM-center tile, sorted order)
                    tm = 64
                    cp = np.asarray(cpos)
                    base = cp[:, (np.arange(m) // tm) * tm]
                    rel2 = np.asarray(gidx) - base[:, :, None]
                    stats(rel2, use_depth,
                          f"sa{lvl} r={r} s={s} [tilebase{tm}]")
        # descend with sorted centers (permutation-equivariant consumers)
        if m != n:
            xyz = centers["fps-sorted"][1]
    print("note: rel is idx - center_table_position; windowed kernel needs "
          "TW >= TM + 2*max|rel| coverage (violators handled by fallback)")


if __name__ == "__main__":
    main()
