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

Prints, per FP level, quantiles of |idx - q*M/N| (in KNOWN-table rows)
and the fraction outside candidate windows, split by valid vs zero-cloud
samples (zero clouds are row-uniform -> clamping is exact, same argument
as window_group).

Run: PYTHONPATH=. python tools/measure_fp_window.py [batch=4]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/hcmoco_jax_cache")

import jax.numpy as jnp  # noqa: E402

from hcmoco_tpu.data.synthetic import synthetic_contrast_batch  # noqa: E402
from hcmoco_tpu.models.pointnet2_model import depth2pts, NPOINTS  # noqa: E402
from hcmoco_tpu.ops.point_ops import (  # noqa: E402
    furthest_point_sample, gather_points, three_nn)

WINDOWS = (64, 128, 256, 512, 1024)


def main() -> None:
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    for seed in range(3):
        batch = synthetic_contrast_batch(
            np.random.default_rng(seed), b, size=320, num_joints=16,
            n_data=4096)
        depth = jnp.asarray(batch["rgbd"][..., 3])
        sampled, _, _ = depth2pts(
            depth, jnp.asarray(batch["depth_mask"]),
            jnp.asarray(batch["grid_xy"]), 320.0, 320.0,
            jnp.asarray(batch["depth_mean"]), jax.random.PRNGKey(seed), 4096)
        use_depth = np.asarray(batch["use_depth"])

        # replicate the model's l_xyz chain: sorted FPS per level
        l_xyz = [sampled]
        for lvl in range(4):
            m = NPOINTS[lvl]
            if m == l_xyz[lvl].shape[1]:
                l_xyz.append(l_xyz[lvl])
                continue
            fidx = furthest_point_sample(l_xyz[lvl], m, impl="xla")
            fidx = jnp.sort(fidx, axis=-1)
            l_xyz.append(gather_points(l_xyz[lvl], fidx))

        for i in range(3, -1, -1):
            unknown, known = l_xyz[i], l_xyz[i + 1]
            n, m = unknown.shape[1], known.shape[1]
            _, idx = three_nn(unknown, known, impl="xla")
            base = (np.arange(n) * m) // n
            rel = np.asarray(idx) - base[None, :, None]
            for name, sel in (("valid", use_depth > 0),
                              ("zerocloud", use_depth == 0)):
                if not sel.any():
                    continue
                a = np.abs(rel[sel].reshape(-1))
                qs = np.percentile(a, [50, 95, 99.9, 100])
                viol = "  ".join(
                    f"W{w}:{float((a > w).mean()):.2e}" for w in WINDOWS)
                print(f"seed{seed} fp{i} N={n:5d} M={m:5d} [{name:9s}] "
                      f"p50={qs[0]:5.0f} p95={qs[1]:5.0f} "
                      f"p99.9={qs[2]:5.0f} max={qs[3]:5.0f}  out: {viol}",
                      flush=True)


if __name__ == "__main__":
    main()
