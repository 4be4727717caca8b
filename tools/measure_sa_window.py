"""Size the SA-level locality windows (SA_WINDOWS) at the BENCH shape.

Computes the exact per-sample required half-window of both windowed-
kernel predicates so SA_WINDOWS can be set (or certified) from measured
tails at the real operating shape rather than small-batch estimates.
(The first revision of the round-4 probes sampled n_data points instead
of the model's pn_num_points=4096 and reported phantom under-sizing —
see measure_engage_rate.py's N_POINTS note.)

For every SA level x scale this tool computes, over K sampling keys at
the bench shape, the exact per-sample REQUIRED half-window of both
consumers:

  - ball_query_windowed (ops/pallas/ball_query.py): sweeps lanes
    [c*CMS - w, c*CMS + CMS + w) per 128-center chunk and falls back if
    ANY in-radius table point lies outside — required w derives from the
    min/max in-radius lane per center (O(M*N) reduce, chunked over batch).
  - window_group (ops/pallas/window_group.py): gathers rows
    [t*TMS - w, t*TMS + TMS + w) per 64-center tile from the RETURNED
    indices — required w derives from the min/max returned gidx.

Prints quantiles + the whole-batch trip rate at candidate windows so the
new SA_WINDOWS can be chosen with measured margin (same methodology that
fixed FP_WINDOWS; see models/pointnet2_model.py).

Run (TPU preferred): PYTHONPATH=. python tools/measure_sa_window.py \
    [keys=8] [batch=64]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if jax.default_backend() == "tpu":
    jax.config.update("jax_compilation_cache_dir", "/tmp/hcmoco_jax_cache_tpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/hcmoco_jax_cache")

import jax.numpy as jnp  # noqa: E402

from hcmoco_tpu.data.synthetic import synthetic_contrast_batch  # noqa: E402
from hcmoco_tpu.models.pointnet2_model import (  # noqa: E402
    NPOINTS, NSAMPLE, RADIUS, SA_WINDOWS, depth2pts)
from hcmoco_tpu.ops.point_ops import (  # noqa: E402
    ball_query, furthest_point_sample, gather_points)

TM = 64      # window_group centers/tile
CHUNK_M = 128  # ball_query_windowed centers/chunk
CAND = (128, 192, 256, 384, 512, 768, 1024)
# the model samples pn_num_points=4096 from the n_data cloud
# (see measure_engage_rate.py N_POINTS note)
N_POINTS = 4096


def _inradius_lane_extremes(xyz, new_xyz, r2, bchunk=8):
    """Per-center (min, max) in-radius table lane, chunked over batch."""
    b, n, _ = xyz.shape
    lanes = jnp.arange(n, dtype=jnp.int32)

    @jax.jit
    def one(xc, nc):
        d2 = jnp.sum((nc[:, :, None, :] - xc[:, None, :, :]) ** 2, axis=-1)
        inr = d2 < r2
        mn = jnp.min(jnp.where(inr, lanes[None, None, :], n), axis=-1)
        mx = jnp.max(jnp.where(inr, lanes[None, None, :], -1), axis=-1)
        return mn, mx

    mns, mxs = [], []
    for s in range(0, b, bchunk):
        mn, mx = one(xyz[s:s + bchunk], new_xyz[s:s + bchunk])
        mns.append(np.asarray(mn))
        mxs.append(np.asarray(mx))
    return np.concatenate(mns), np.concatenate(mxs)


def _required_w(lo, hi, m, n, centers_per_tile):
    """Per-sample required half-window given per-center lane extremes.

    lo/hi: (B, M) min/max lane a tile must reach (n/-1 where none).
    Tile t covers centers [t*CPT, (t+1)*CPT) and lanes
    [t*CPT*stride - w, t*CPT*stride + CPT*stride + w)."""
    stride = n // m
    span = centers_per_tile * stride
    tstart = ((np.arange(m) // centers_per_tile) * span)[None, :]
    need_left = np.where(lo < n, tstart - lo, 0)
    need_right = np.where(hi >= 0, hi - (tstart + span - 1), 0)
    need = np.maximum(np.maximum(need_left, need_right), 0)
    return need.max(axis=1)  # (B,) per-sample required w


def main() -> None:
    keys = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    size, n_data = 320, 8192
    batch = synthetic_contrast_batch(
        np.random.default_rng(0), b, size=size, num_joints=16,
        n_data=n_data)
    depth = jnp.asarray(batch["rgbd"][..., 3])
    use_depth = np.asarray(batch["use_depth"]) > 0
    print(f"b={b} size={size} n_data={n_data} "
          f"backend={jax.default_backend()} valid={int(use_depth.sum())}/{b}")

    need_bq = {}   # (lvl, sc) -> list of per-sample required w (valid only)
    need_wg = {}
    for ki in range(keys):
        key = jax.random.fold_in(jax.random.PRNGKey(0), ki)
        sampled, _, _, _ = depth2pts(
            depth, jnp.asarray(batch["depth_mask"]),
            jnp.asarray(batch["grid_xy"]), 320.0, 320.0,
            jnp.asarray(batch["depth_mean"]), key, N_POINTS)

        l_xyz = [sampled]
        for lvl in range(4):
            m = NPOINTS[lvl]
            xyz = l_xyz[lvl]
            if m == xyz.shape[1]:
                l_xyz.append(xyz)
            else:
                fidx = jnp.sort(furthest_point_sample(xyz, m), axis=-1)
                l_xyz.append(gather_points(xyz, fidx))

        for lvl in range(4):
            xyz, new_xyz = l_xyz[lvl], l_xyz[lvl + 1]
            n, m = xyz.shape[1], new_xyz.shape[1]
            for sc, (r, s) in enumerate(zip(RADIUS[lvl], NSAMPLE[lvl])):
                lo, hi = _inradius_lane_extremes(xyz, new_xyz, r * r)
                wb = _required_w(lo, hi, m, n, CHUNK_M)[use_depth]
                gidx = np.asarray(ball_query(xyz, new_xyz, r, s))
                glo = gidx.min(axis=-1)
                ghi = gidx.max(axis=-1)
                wg = _required_w(glo, ghi, m, n, TM)[use_depth]
                kb = (lvl, sc)
                need_bq.setdefault(kb, []).append(wb)
                need_wg.setdefault(kb, []).append(wg)
        print(f"key{ki} done", flush=True)

    for (lvl, sc) in sorted(need_bq):
        wb = np.concatenate(need_bq[(lvl, sc)])
        wg = np.concatenate(need_wg[(lvl, sc)])
        cur = SA_WINDOWS[lvl][sc]
        n, m = (NPOINTS[lvl - 1] if lvl else N_POINTS), NPOINTS[lvl]
        # whole-batch engage: every valid sample of a step must fit
        nb = wb.reshape(keys, -1)
        trips = "  ".join(
            f"W{c}:{int((nb.max(axis=1) > c).sum())}/{keys}"
            for c in CAND if c >= cur // 2)
        print(f"sa{lvl}.{sc} N={n:5d} M={m:5d} cur_w={cur:4d} "
              f"bq_req p50={np.percentile(wb, 50):5.0f} "
              f"p99={np.percentile(wb, 99):5.0f} max={wb.max():5.0f} | "
              f"wg_req max={wg.max():5.0f} | batch_trips {trips}",
              flush=True)


if __name__ == "__main__":
    main()
