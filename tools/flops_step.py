"""Measure the flagship train step's FLOPs/sample via XLA cost analysis.

Feeds BASELINE.md's "Analytic V100 bound" and bench.py's vs_baseline
denominator: the full stage-1 step (2x HRNet-W18 @320^2 + SemGCN forward,
6-way counts-NCE, backward, SGD update, bank update) is lowered at two
batch sizes to confirm per-sample linearity.

Measured on this image (exit log /tmp/flops_step.log, 2026-08-19):
    HRNet    bs=4  319.66 G total -> 79.915 G/sample
    HRNet    bs=8  639.18 G total -> 79.897 G/sample
    HRNetPN  bs=4  445.37 G total -> 111.342 G/sample
    HRNetPN  bs=8  890.66 G total -> 111.332 G/sample
Run on CPU: python tools/flops_step.py [--arch HRNetPN]

For HRNetPN the Pallas point kernels lower in interpret mode on CPU;
their FLOPs contribution (FPS distance updates, ball-query compares) is
O(N^2) compares, not MACs, and is negligible next to the conv/matmul
count, so the cost-analysis number is the right MXU-relevant numerator
for an MFU/V100 bound either way.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# FLOPS_TPU=1: lower+compile on the real TPU backend and read the
# OPTIMIZED executable's cost analysis (bytes accessed reflects the real
# fusion/layout decisions — the roofline denominator for BASELINE.md's
# ">=4x settled?" decomposition).  Default: forced CPU, HLO-level FLOPs.
if os.environ.get("FLOPS_TPU", "0") == "1":
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/hcmoco_jax_cache_tpu")
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/hcmoco_jax_cache")

import numpy as np  # noqa: E402

from hcmoco_tpu.core.config import TrainConfig, resolve_config  # noqa: E402
from hcmoco_tpu.models.build import build_model  # noqa: E402
from hcmoco_tpu.train.state import create_train_state  # noqa: E402
from hcmoco_tpu.train.contrast_step import make_contrast_train_step  # noqa: E402,E501
from hcmoco_tpu.data.synthetic import synthetic_contrast_batch  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="HRNet",
                    choices=["HRNet", "HRNetPN"])
    ap.add_argument("--width", type=int, default=18)
    ap.add_argument("--batch_sizes", type=str, default="4,8",
                    help="comma list; use 128 with FLOPS_TPU=1 for the "
                         "real operating point")
    args = ap.parse_args()
    arch = args.arch
    on_tpu = jax.default_backend() == "tpu"
    for bs in tuple(int(x) for x in args.batch_sizes.split(",")):
        cfg = resolve_config(TrainConfig(
            method="CMCRGBD2S", arch=arch, width=args.width,
            batch_size=bs, epochs=100, learning_rate=0.03, cosine=True,
            nce_k=16384, modality_missing=True, crop_size=320,
            compute_dtype="bfloat16"))
        model = build_model(cfg)
        rng = np.random.default_rng(0)
        batch = synthetic_contrast_batch(rng, bs, size=320, num_joints=16,
                                         n_data=8192)
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch,
                                   n_data=8192, steps_per_epoch=100)
        step = make_contrast_train_step(cfg, model, steps_per_epoch=100)
        lowered = jax.jit(step).lower(state, batch, jax.random.PRNGKey(0))
        cost = lowered.compile().cost_analysis() if on_tpu \
            else lowered.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        f = float(cost.get("flops", float("nan")))
        b = float(cost.get("bytes accessed", float("nan")))
        extra = ""
        if b == b:  # not nan
            # v5e roofline: 197 TF/s bf16 MXU, 819 GB/s HBM
            extra = (f"  bytes={b / 1e9:.2f} GB"
                     f"  hbm_bound={b / 819e9 * 1e3:.1f} ms"
                     f"  mxu_bound={f / 197e12 * 1e3:.1f} ms")
        print(f"bs={bs} flops={f / 1e9:.2f} G  per-sample="
              f"{f / bs / 1e9:.3f} G{extra}", flush=True)


if __name__ == "__main__":
    main()
