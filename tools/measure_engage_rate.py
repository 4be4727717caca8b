"""Measure, on-chip, how often each windowed-kernel exactness cond ENGAGES.

Both window_group (SA grouping) and window_interpolate (FP interpolation)
run behind a whole-batch `lax.cond`: ONE non-row-uniform sample with an
out-of-window index sends that call back to the exact XLA path for the
whole step.  A profile shows which branch ran during ITS capture window,
but the engage RATE over many sampling keys is what the e2e number
actually averages.  This tool replicates the model's index pipeline
(depth2pts -> sorted FPS -> ball_query / three_nn) at the bench shape
and evaluates the EXACT cond predicates of both kernels for every SA
level/scale and FP level over K sampling keys.  (See the N_POINTS note:
the first revision sampled the wrong point count and measured a phantom
geometry.)

Run on the TPU (or CPU, slower): PYTHONPATH=. python
tools/measure_engage_rate.py [keys=20] [batch=64]
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
    FP_WINDOWS, NPOINTS, NSAMPLE, RADIUS, SA_WINDOWS, depth2pts)
from hcmoco_tpu.ops.pallas.window_group import _round_window  # noqa: E402
from hcmoco_tpu.ops.point_ops import (  # noqa: E402
    ball_query, furthest_point_sample, gather_points, three_nn)

# match the MODEL's op implementation (models/build.py:277): Pallas on
# TPU, XLA elsewhere.  The round-5 fp0/fp1 fallback postmortem: this
# probe's first run used the xla impl while the model ran pallas — the
# different FPS/3-NN tie-breaking gives a different center geometry, so
# the probe certified windows the real pipeline violates.
IMPL = "pallas" if jax.default_backend() == "tpu" else "xla"

TM = 64   # window_group centers/tile
TN = 256  # window_interpolate unknowns/tile
# the MODEL samples pn_num_points=4096 from the n_data-point cloud
# (core/config.py:236, models/pointnet2_model.py::HCMoCoPN.n_points);
# an earlier revision of this probe passed n_data as the sample count,
# which shifted every SA/FP level one step coarser and measured a
# PHANTOM geometry (its "sa0 never engages / fp0 window too small"
# findings were artifacts — the round-4 profile's branch_1_fun shapes
# pin the real sa0 at N=M=4096, stride 1)
N_POINTS = 4096


def _sa_viol(gidx, n, window):
    """window_group's exactness predicate (window_group.py:216-222),
    violations only (rowuni handled by the caller)."""
    b, m, s = gidx.shape
    stride = n // m
    tms = TM * stride
    w, _ = _round_window(window, tms)
    tw = tms + 2 * w
    base = ((jnp.arange(m, dtype=jnp.int32) // TM) * tms)[None, :, None]
    viol = (gidx < base - w) | (gidx >= base - w + tw)
    return jnp.any(viol, axis=(1, 2))


def _fp_viol(idx, m, window):
    """window_interpolate's predicate (window_interp.py:246-251)."""
    b, n, _ = idx.shape
    tn = min(TN, n)
    ts = tn * m // n
    tw = ts + 2 * window
    tbase = ((jnp.arange(n, dtype=jnp.int32) // tn) * ts)[None, :, None]
    viol = (idx < tbase - window) | (idx >= tbase - window + tw)
    return jnp.any(viol, axis=(1, 2))


def step_predicates(depth, mask, grid_xy, dmean, key, n_points):
    sampled, _, _, _ = depth2pts(depth, mask, grid_xy, 320.0, 320.0,
                              dmean, key, n_points)
    rowuni = jnp.all(sampled == sampled[:, :1, :], axis=(1, 2))

    l_xyz = [sampled]
    for lvl in range(4):
        m = NPOINTS[lvl]
        xyz = l_xyz[lvl]
        if m == xyz.shape[1]:
            l_xyz.append(xyz)
        else:
            fidx = jnp.sort(furthest_point_sample(xyz, m, impl=IMPL),
                            axis=-1)
            l_xyz.append(gather_points(xyz, fidx))

    out = {}
    for lvl in range(4):
        xyz, new_xyz = l_xyz[lvl], l_xyz[lvl + 1]
        for sc, (r, s) in enumerate(zip(RADIUS[lvl], NSAMPLE[lvl])):
            win = SA_WINDOWS[lvl][sc]
            gidx = ball_query(xyz, new_xyz, r, s, impl=IMPL, window=win)
            bad = _sa_viol(gidx, xyz.shape[1], win) & ~rowuni
            out[f"sa{lvl}.{sc}"] = jnp.any(bad)
    for i in range(4):
        unknown, known = l_xyz[i], l_xyz[i + 1]
        _, idx = three_nn(unknown, known, impl=IMPL)
        bad = _fp_viol(idx, known.shape[1], FP_WINDOWS[i]) & ~rowuni
        out[f"fp{i}"] = jnp.any(bad)
    return out


def main() -> None:
    keys = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    size, n_data = 320, 8192
    batch = synthetic_contrast_batch(
        np.random.default_rng(0), b, size=size, num_joints=16,
        n_data=n_data)
    depth = jnp.asarray(batch["rgbd"][..., 3])
    mask = jnp.asarray(batch["depth_mask"])
    grid_xy = jnp.asarray(batch["grid_xy"])
    dmean = jnp.asarray(batch["depth_mean"])
    print(f"b={b} size={size} n_data={n_data} backend={jax.default_backend()}"
          f" valid={int((np.asarray(batch['use_depth']) > 0).sum())}/{b}")

    fn = jax.jit(step_predicates, static_argnums=(5,))
    trip = {}
    for ki in range(keys):
        key = jax.random.fold_in(jax.random.PRNGKey(0), ki)
        out = jax.device_get(fn(depth, mask, grid_xy, dmean, key,
                                N_POINTS))
        for k, v in out.items():
            trip[k] = trip.get(k, 0) + bool(v)
    for k in sorted(trip):
        rate = 1 - trip[k] / keys
        print(f"{k}: engage_rate={rate:.2f} ({keys - trip[k]}/{keys} steps)")


if __name__ == "__main__":
    main()
