"""Profile the flagship stage-1 train step on the real TPU.

Captures a jax.profiler trace of a few chained steps (same config as
bench.py) so we can attribute time to ops (convs vs resizes vs BN vs loss)
and attack the 6-9%% MFU ceiling (VERDICT round-1 item 3).

Usage: python tools/profile_step.py [--batch 128] [--out /tmp/hcmoco_prof]
Writes the xplane trace under <out>/plugins/profile/... and prints step time.
"""

import argparse
import functools
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--out", default="/tmp/hcmoco_prof")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from hcmoco_tpu.core.config import TrainConfig, resolve_config
    from hcmoco_tpu.models.build import build_model
    from hcmoco_tpu.parallel.mesh import make_mesh, shard_batch, \
        replicated_sharding
    from hcmoco_tpu.train.state import create_train_state
    from hcmoco_tpu.train.contrast_step import make_contrast_train_step
    from hcmoco_tpu.data.synthetic import synthetic_contrast_batch

    n_chips = len(jax.devices())
    batch_size = args.batch * n_chips
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
    step = make_contrast_train_step(cfg, model, steps_per_epoch=100)
    sharded = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(0)

    n_iters = args.iters

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state, batch, rng):
        def body(st, i):
            st, m = step(st, batch, jax.random.fold_in(rng, i))
            return st, m["loss"]
        return jax.lax.scan(body, state, jnp.arange(n_iters))

    # compile + warm
    state, losses = multi_step(state, sharded, key)
    np.asarray(losses)
    print("compiled; warm step timing...")

    t0 = time.perf_counter()
    state, losses = multi_step(state, sharded, jax.random.fold_in(key, 1))
    np.asarray(losses)
    dt = time.perf_counter() - t0
    print(f"warm: {dt / n_iters * 1e3:.1f} ms/step, "
          f"{batch_size * n_iters / dt / n_chips:.1f} samples/s/chip")

    with jax.profiler.trace(args.out):
        state, losses = multi_step(state, sharded, jax.random.fold_in(key, 2))
        np.asarray(losses)
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
