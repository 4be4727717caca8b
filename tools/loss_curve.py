"""Deterministic loss-curve runner — the loss-parity harness skeleton.

BASELINE.json's parity target is the loss CURVE over the first 100 steps
with matched seeds (bitwise parity with the reference is impossible across
RNG implementations — SURVEY.md §7 hard-part 4).  This runner produces a
fully deterministic curve for a named config; curves are stored under
tests/golden/ and asserted in tests/test_loss_curve.py so any unintended
change to the training dynamics (losses, schedules, bank updates) shows up
as a diff.

  python tools/loss_curve.py --steps 20 --out curve.json
"""

from __future__ import annotations

import argparse
import json


def run_curve(steps: int = 20, width: int = 4, batch_size: int = 8,
              stage2: bool = True, seed: int = 0, arch: str = "HRNet"):
    import numpy as np
    import jax

    from hcmoco_tpu.core.config import TrainConfig
    from hcmoco_tpu.models.build import build_model
    from hcmoco_tpu.train.state import create_train_state
    from hcmoco_tpu.train.contrast_step import make_contrast_train_step
    from hcmoco_tpu.data.synthetic import synthetic_contrast_batch

    cfg = TrainConfig(
        modal="RGBD2S", arch=arch, width=width,
        mem="bank+jointspri3d" if stage2 else "bank",
        linear_feat_map=stage2, pri3d_num_samples_per_image=8,
        nce_k=15, batch_size=batch_size, epochs=4,
        learning_rate=0.05, modality_missing=True,
        compute_dtype="float32", seed=seed,
        # HRNetPN: tiny point budget keeps the PN stack (depth2pts -> SA ->
        # FP -> pts2depth) on CPU-feasible shapes while exercising every op
        pn_num_points=32 if arch == "HRNetPN" else 4096,
        # pin the indexed negative draw the golden was generated with; the
        # default 'counts' mode draws the same distribution from a different
        # RNG stream (equivalence tested in test_contrast.py)
        bank_logits="dense",
    )
    model = build_model(cfg)
    rng = np.random.default_rng(seed)
    batches = [synthetic_contrast_batch(rng, batch_size, size=32,
                                        num_joints=16, n_data=64)
               for _ in range(min(steps, 4))]
    state = create_train_state(cfg, model, jax.random.PRNGKey(seed),
                               batches[0], n_data=64, steps_per_epoch=4)
    step = make_contrast_train_step(cfg, model, steps_per_epoch=4)
    key = jax.random.PRNGKey(seed + 1)
    curve = []
    for i in range(steps):
        state, metrics = step(state, batches[i % len(batches)],
                              jax.random.fold_in(key, i))
        curve.append(float(metrics["loss"]))
    return curve


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--out", type=str, default="")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--arch", type=str, default="HRNet")
    args = p.parse_args(argv)
    curve = run_curve(steps=args.steps, seed=args.seed, arch=args.arch)
    payload = {"steps": args.steps, "seed": args.seed, "arch": args.arch,
               "curve": curve}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
