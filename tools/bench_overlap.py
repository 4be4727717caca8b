"""Measured host/device overlap run (VERDICT round-2 weak #5).

bench.py's `e2e_overlap_model` assumes host batch production and the
device step overlap perfectly (min(host, device)).  This tool MEASURES an
overlapped run: the packed-pipeline prefetcher (thread pool + prefetch
queue, data/pipeline.py::DataSource) produces batches concurrently with a
jitted train-step loop consuming them, and the sustained end-to-end rate
is compared against each side's solo rate.

On this image the loop runs on the forced-CPU backend (feeding the real
chip through the ~5-25 MB/s dispatch tunnel would measure the tunnel, not
the design — see tools/bench_input.py); the overlap mechanics (prefetch
thread fills while the device executes) are identical on a TPU VM, where
batches move over local PCIe DMA.

Prints one JSON line:
  {"metric": "hcmoco_overlap_e2e", "value": <samples/s>,
   "host_solo": ..., "device_solo": ..., "overlap_efficiency": ...}

Usage: python tools/bench_overlap.py [--batch 32] [--steps 30]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--crop", type=int, default=64)
    ap.add_argument("--width", type=int, default=4)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/hcmoco_jax_cache_overlap")
    import jax.numpy as jnp

    from tools.bench_input import FIXTURE, make_fixture
    from hcmoco_tpu.data.packed import PackedNTUSkeleton
    from hcmoco_tpu.data.pipeline import DataSource
    from hcmoco_tpu.core.config import TrainConfig, resolve_config
    from hcmoco_tpu.models.build import build_model
    from hcmoco_tpu.train.state import create_train_state
    from hcmoco_tpu.train.contrast_step import (
        make_contrast_train_step, device_normalize)

    if not os.path.exists(os.path.join(FIXTURE, "meta.json")):
        print("building packed fixture...", file=sys.stderr)
        make_fixture()

    ds = PackedNTUSkeleton(FIXTURE, size=args.crop, random_flip=True,
                           random_resized_crop=True, seed=0,
                           raw_output=True)
    src = DataSource(ds, args.batch, np.ones(len(ds.files)), seed=0,
                     num_workers=8, prefetch=4)

    sk_rng = np.random.default_rng(3)

    def with_model_fields(b):
        # the packed source ships raw pixels + 3d joints; the tri-modal
        # step additionally wants the GCN 2D joints and modality flags
        # (negligible host cost; rendered on-the-fly like the real loader)
        n = b["index"].shape[0]
        b["skeleton"] = sk_rng.uniform(
            -1, 1, (n, 16, 2)).astype(np.float32)
        b["use_depth"] = np.ones(n, np.int32)
        b["use_rgb"] = np.ones(n, np.int32)
        return b

    cfg = resolve_config(TrainConfig(
        method="CMCRGBD2S", arch="HRNet", width=args.width,
        batch_size=args.batch, epochs=2, nce_k=255,
        modality_missing=True, crop_size=args.crop,
        compute_dtype="float32"))
    model = build_model(cfg)

    it = iter(src)
    example = {k: jnp.asarray(v)
               for k, v in with_model_fields(next(it)).items()}
    example_n = device_normalize(example)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               example_n, n_data=512, steps_per_epoch=10)
    step = make_contrast_train_step(cfg, model, steps_per_epoch=10)

    rng = jax.random.PRNGKey(1)
    # warm both sides (compile + pool spin-up)
    state, m = step(state, example, rng)
    float(m["loss"])
    for _ in range(2):
        with_model_fields(next(it))

    # --- solo device rate (same resident batch, chained) ---
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, m = step(state, example, jax.random.fold_in(rng, i))
    float(m["loss"])
    device_solo = args.batch * args.steps / (time.perf_counter() - t0)

    # --- solo host rate ---
    t0 = time.perf_counter()
    for _ in range(args.steps):
        with_model_fields(next(it))
    host_solo = args.batch * args.steps / (time.perf_counter() - t0)

    # --- overlapped: prefetcher fills while the device steps ---
    # (async dispatch: step returns before the computation finishes; the
    # next(it) call then runs concurrently with device execution)
    t0 = time.perf_counter()
    for i in range(args.steps):
        batch = with_model_fields(next(it))
        state, m = step(state, batch, jax.random.fold_in(rng, 100 + i))
    float(m["loss"])
    e2e = args.batch * args.steps / (time.perf_counter() - t0)

    bound = min(host_solo, device_solo)
    out = {
        "metric": "hcmoco_overlap_e2e",
        "value": round(e2e, 1),
        "unit": "samples/sec",
        "host_solo": round(host_solo, 1),
        "device_solo": round(device_solo, 1),
        "overlap_bound": round(bound, 1),
        "overlap_efficiency": round(e2e / bound, 3),
        "batch": args.batch,
        "backend": "cpu",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
