"""Measure 3-NN neighbor locality for the FP (feature-propagation) levels.

The FP modules interpolate known-level features onto unknown-level points
via three_nn + weighted gather (models/pointnet2_model.py::FPModule,
reference pointnet2_modules.py:120-156).  With depth2pts emitting
raster-sorted samples and every SA level re-sorting its FPS indices
ascending, both the unknown and known tables are in raster order, so the
3-NN known-index of unknown point q should lie near the linear base
floor(q*M/N) — the feasibility condition for replacing the FP gather /
backward scatter (~57 ms/step of the round-4 bs64 HRNetPN profile) with
windowed weighted one-hot matmuls on the MXU (ops/pallas/window_interp).

Evaluates BOTH statistics:
  - per-point deviation |idx - floor(q*M/N)| quantiles (window sizing)
  - the kernel's ACTUAL per-tile predicate (window_interp.py: idx within
    [tbase - W, tbase - W + TW), tbase = (q // TN) * TS) — the fraction
    of whole BATCHES that would trip the exactness cond per level, which
    is what decides whether the kernel engages end to end.

METHODOLOGY NOTE (round 4): the windows must be sized at the REAL
operating shape — b=64 bench batches AND the model's true sample count.
Two successive sizing bugs were caught here: (1) the original 3-seed
b=4 measurement missed the b=64 tail; (2) the first b=64 re-measurement
passed n_data=8192 as depth2pts' SAMPLE count, but the model samples
pn_num_points=4096 (core/config.py:236) — so it sized a PHANTOM
geometry whose levels sit one step coarser than the real ones (its
"fp0 needs w=1024" applied to a level that doesn't exist; the real fp0
interpolates a level onto ITSELF, N=M=4096).  Current numbers below
come from the fixed pipeline.

Run: PYTHONPATH=. python tools/measure_fp_window.py [batch=64] [keys=8]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# SIZING BUG #3 (round 5): this tool originally forced CPU and XLA point
# ops, but the model on TPU runs point_impl="pallas" (models/build.py) —
# the Pallas FPS/3-NN tie-breaking selects DIFFERENT center sets, so
# windows sized on the XLA geometry under-size the real one (round-5
# profile: fp0/fp1 cond fell back 20/20 steps while the xla-impl probe
# said it engaged 20/20).  Measure on the backend and impl the model
# actually uses: run this ON THE TPU.
if jax.default_backend() == "tpu":
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/hcmoco_jax_cache_tpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/hcmoco_jax_cache")

import jax.numpy as jnp  # noqa: E402

from hcmoco_tpu.data.synthetic import synthetic_contrast_batch  # noqa: E402
from hcmoco_tpu.models.pointnet2_model import (  # noqa: E402
    depth2pts, FP_WINDOWS, NPOINTS)
from hcmoco_tpu.ops.point_ops import (  # noqa: E402
    furthest_point_sample, gather_points, three_nn)

TN = 256  # window_interpolate's tile size
# the model samples pn_num_points=4096 (see
# measure_engage_rate.py N_POINTS note: an earlier revision
# passed n_data here and measured a phantom geometry)
N_POINTS = 4096


def main() -> None:
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    keys = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    size, n_data = 320, 8192  # the bench operating shape
    batch = synthetic_contrast_batch(
        np.random.default_rng(0), b, size=size, num_joints=16,
        n_data=n_data)
    depth = jnp.asarray(batch["rgbd"][..., 3])
    use_depth = np.asarray(batch["use_depth"])
    impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    print(f"b={b} size={size} n_data={n_data} impl={impl} "
          f"backend={jax.default_backend()} "
          f"valid={int((use_depth > 0).sum())}/{b}")

    max_dev = {}
    bad_batches = {}
    for ki in range(keys):
        key = jax.random.fold_in(jax.random.PRNGKey(0), ki)
        sampled, _, _, _ = depth2pts(
            depth, jnp.asarray(batch["depth_mask"]),
            jnp.asarray(batch["grid_xy"]), 320.0, 320.0,
            jnp.asarray(batch["depth_mean"]), key, N_POINTS)

        # replicate the model's l_xyz chain: sorted FPS per level
        l_xyz = [sampled]
        for lvl in range(4):
            m = NPOINTS[lvl]
            if m == l_xyz[lvl].shape[1]:
                l_xyz.append(l_xyz[lvl])
                continue
            fidx = furthest_point_sample(l_xyz[lvl], m, impl=impl)
            fidx = jnp.sort(fidx, axis=-1)
            l_xyz.append(gather_points(l_xyz[lvl], fidx))

        for i in range(3, -1, -1):
            unknown, known = l_xyz[i], l_xyz[i + 1]
            n, m = unknown.shape[1], known.shape[1]
            _, idx = three_nn(unknown, known, impl=impl)
            idx = np.asarray(idx)
            w = FP_WINDOWS[i]
            tn = min(TN, n)
            ts = tn * m // n
            tw = ts + 2 * w
            tbase = ((np.arange(n) // tn) * ts)[None, :, None]
            viol = (idx < tbase - w) | (idx >= tbase - w + tw)
            pbase = (np.arange(n) * m) // n
            dev = np.abs(idx - pbase[None, :, None])
            sel = use_depth > 0  # zero clouds are row-uniform: clamp-exact
            d = dev[sel].reshape(-1)
            nbad = int(viol[sel].any(axis=(1, 2)).sum())
            max_dev[i] = max(max_dev.get(i, 0), int(d.max()))
            bad_batches[i] = bad_batches.get(i, 0) + (nbad > 0)
            qs = np.percentile(d, [50, 95, 99.9, 100])
            print(f"key{ki} fp{i} N={n:5d} M={m:5d} W={w:4d} "
                  f"p50={qs[0]:4.0f} p95={qs[1]:4.0f} p99.9={qs[2]:4.0f} "
                  f"max={qs[3]:4.0f} bad_samples={nbad}/{int(sel.sum())}",
                  flush=True)

    for i in range(4):
        print(f"fp{i}: max_dev_over_keys={max_dev[i]} "
              f"W={FP_WINDOWS[i]} margin={FP_WINDOWS[i] / max_dev[i]:.2f}x "
              f"batches_tripping_cond={bad_batches[i]}/{keys}")


if __name__ == "__main__":
    main()
