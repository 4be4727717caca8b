"""Capture a TPU profiler trace of the flagship stage-1 bench step and print
the top ops by device self-time.

Usage: python tools/perf_profile.py [--batch 128] [--iters 5] [--out DIR]

Writes the xplane trace under --out (default /tmp/hcmoco_profile) and, if
tensorboard_plugin_profile is importable, prints the framework op stats table
to stdout (top 40 rows) so the hot ops are visible without a browser.
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="/tmp/hcmoco_profile")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--arch", default="HRNet")
    ap.add_argument("--channel_pad", type=int, default=0)
    ap.add_argument("--bn_matmul", action="store_true",
                    help="BN stats as MXU matvecs (HCMOCO_BN_MATMUL)")
    args = ap.parse_args()
    if args.bn_matmul:
        os.environ["HCMOCO_BN_MATMUL"] = "1"

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/hcmoco_jax_cache_tpu")
    import functools
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
        method="CMCRGBD2S", arch=args.arch, width=18,
        batch_size=batch_size, epochs=100, learning_rate=0.03, cosine=True,
        nce_k=16384, modality_missing=True, crop_size=320,
        compute_dtype="bfloat16", remat=args.remat,
        channel_pad=args.channel_pad,
    ))
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = synthetic_contrast_batch(rng, batch_size, size=320,
                                     num_joints=16, n_data=n_data)

    mesh = make_mesh()
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch,
                               n_data=n_data, steps_per_epoch=100)
    state = jax.device_put(state, replicated_sharding(mesh))
    step = make_contrast_train_step(cfg, model, steps_per_epoch=100,
                                    mesh=mesh)
    sharded = shard_batch(batch, mesh)

    n_iters = args.iters

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state, batch, rng):
        def body(st, i):
            st, m = step(st, batch, jax.random.fold_in(rng, i))
            return st, m["loss"]

        return jax.lax.scan(body, state, jnp.arange(n_iters))

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    state, losses = multi_step(state, sharded, key)
    print(f"compile+first run: {time.time() - t0:.1f}s "
          f"loss={np.asarray(losses)[-1]:.4f}", flush=True)

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        state, losses = multi_step(state, sharded, key)
        _ = np.asarray(losses)  # host fetch forces completion
    print(f"trace captured under {args.out}", flush=True)

    xplanes = sorted(glob.glob(
        os.path.join(args.out, "**", "*.xplane.pb"), recursive=True))
    if not xplanes:
        print("NO XPLANE FILES FOUND — device trace unavailable?")
        return
    print("xplane:", xplanes[-1], flush=True)

    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
    except Exception as e:  # noqa: BLE001
        print("plugin import failed:", e)
        return

    for tool in ("framework_op_stats", "tensorflow_stats", "op_profile"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                [xplanes[-1]], tool + "^", {})
            out_path = os.path.join(args.out, f"{tool}.out")
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(out_path, mode) as f:
                f.write(data)
            print(f"== {tool} -> {out_path} ({len(data)} bytes)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"tool {tool} failed: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
