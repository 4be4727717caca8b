"""Versatility CLI: joint contrastive + cross-modality supervised
segmentation with per-modality validation.

Reference: `pycontrast/main_segmentor.py` — builds the tri-modal model + an
FCN classifier over the 128-d linear_merge features, trains with
supervise_type-selected supervision, validates rgb/d/rgbd heads each epoch
and tracks the best mIoU of the `--test_type` head (:96-128).
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import numpy as np

from .main_contrast import build_argparser, config_from_args


def main(argv=None):
    p = build_argparser()
    args = p.parse_args(argv)
    cfg = config_from_args(args)
    if not cfg.dataset:
        cfg = dataclasses.replace(cfg, dataset="NTUSeg", modal="RGBD2S",
                                  mem="bank+jointspri3d",
                                  linear_feat_map=True)

    import jax
    import jax.numpy as jnp
    from ..models.build import build_model
    from ..models.heads import FCNHead
    from ..parallel.mesh import make_mesh, shard_batch, replicated_sharding
    from ..train.state import TrainState, make_optimizer
    from ..contrast.memory import init_memory
    from ..train.segment_step import (
        make_segment_train_step, make_validate_fn, calc_seg_metrics)
    from ..train.checkpoint import CheckpointManager
    from ..utils.meters import MetricLogger
    from ..data.pipeline import build_contrast_source, DataSource
    from ..data.combined import NTUSegJoint

    mesh = make_mesh()
    model = build_model(cfg)
    classifier = FCNHead(channels=128, num_classes=cfg.n_class,
                         num_convs=1, kernel_size=1)

    if args.synthetic:
        from ..data.synthetic import SyntheticContrastSource

        n_data = args.synthetic
        source = SyntheticContrastSource(
            cfg.batch_size, size=cfg.crop_size, num_joints=cfg.num_joints,
            n_data=n_data, seed=cfg.seed)
        steps_per_epoch = max(n_data // cfg.batch_size, 1)
        val_source = None

        def add_labels(it):
            rng = np.random.default_rng(cfg.seed + 7)
            for b in it:
                bsz, s = b["rgbd"].shape[0], b["rgbd"].shape[1]
                b["label"] = rng.integers(
                    0, cfg.n_class, (bsz, s, s)).astype(np.int32)
                b["true_label"] = (rng.random(bsz) < 0.5).astype(np.int32)
                yield b

        train_iter = add_labels(iter(source))
    else:
        source, n_data, steps_per_epoch = build_contrast_source(cfg)
        train_iter = iter(source)
        val_ds = NTUSegJoint(
            cfg.data_folder, cfg.train_file_list, cfg.seg_root,
            cfg.seg_val_file_list, size=cfg.crop_size,
            random_resized_crop=True, only_seg=True, seed=cfg.seed + 1)
        val_source = DataSource(val_ds, cfg.batch_size,
                                np.ones(len(val_ds)), seed=cfg.seed + 2,
                                num_workers=8)

    example = next(train_iter)

    rng = jax.random.PRNGKey(cfg.seed)
    r1, r2, r3 = jax.random.split(rng, 3)
    mv = model.init(r1, example["rgbd"][:1], example["skeleton"][:1],
                    train=False, return_fm=True)
    cv = classifier.init(r2, jnp.zeros((1, cfg.crop_size // 4,
                                        cfg.crop_size // 4, 128)),
                         train=False)
    params = {"model": mv["params"], "classifier": cv["params"]}
    batch_stats = {"model": mv.get("batch_stats", {}),
                   "classifier": cv.get("batch_stats", {})}
    tx, _ = make_optimizer(cfg, steps_per_epoch)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=batch_stats, opt_state=tx.init(params),
        memory=init_memory(r3, 3, n_data, cfg.feat_dim))

    if cfg.pretrain:
        # load a stage-2 pretrain into the versatility model's encoder tree
        # (main_segmentor.py:50-65 key surgery analog)
        from ..train.checkpoint import graft_pretrain

        sub = TrainState(step=state.step, params=state.params["model"],
                         batch_stats=state.batch_stats["model"],
                         opt_state=None, memory=state.memory)
        sub = graft_pretrain(cfg.pretrain, sub)
        state = state.replace(
            params={"model": sub.params,
                    "classifier": state.params["classifier"]},
            batch_stats={"model": sub.batch_stats,
                         "classifier": state.batch_stats["classifier"]},
            memory=sub.memory)

    ckpt_dir = f"{cfg.model_path}/{cfg.model_name}_seg"
    ckpt = CheckpointManager(ckpt_dir, save_freq=cfg.save_freq)
    start_epoch = 1
    if cfg.resume:
        state, last = ckpt.restore(state)
        start_epoch = last + 1

    state = jax.device_put(state, replicated_sharding(mesh))
    step_fn = make_segment_train_step(cfg, model, classifier,
                                      steps_per_epoch, mesh=mesh)
    eval_fn = make_validate_fn(cfg, model, classifier)
    logger = MetricLogger(ckpt_dir, print_freq=cfg.print_freq)

    head_names = ("rgb", "d", "rgbd")
    test_head = {0: "rgbd", 1: "rgb", 2: "d"}[cfg.test_type]
    best_miou = -1.0
    gstep = int(state.step)
    data_rng = jax.random.PRNGKey(cfg.seed + 1)

    for epoch in range(start_epoch, cfg.epochs + 1):
        t0 = time.time()
        logger.reset()
        for i in range(steps_per_epoch):
            batch = shard_batch(next(train_iter), mesh)
            state, metrics = step_fn(state, batch,
                                     jax.random.fold_in(data_rng, gstep))
            gstep += 1
            logger.log_step(epoch, i, steps_per_epoch,
                            {k: float(v) for k, v in metrics.items()},
                            n=cfg.batch_size)
            if args.max_steps and gstep >= args.max_steps:
                break
        logger.write_epoch(epoch)
        ckpt.save(epoch, jax.device_get(state))

        if val_source is not None:
            totals = [np.zeros((4, cfg.n_class), np.float64)
                      for _ in head_names]
            vit = iter(val_source)
            n_val_batches = max(
                len(val_source.dataset) // cfg.batch_size, 1)
            for _ in range(n_val_batches):
                vb = shard_batch(next(vit), mesh)
                counts = eval_fn(state.params, state.batch_stats, vb)
                for hi, c in enumerate(counts):
                    totals[hi] += np.stack(
                        [np.asarray(x, np.float64) for x in c])
            results = {}
            for hi, name in enumerate(head_names):
                aacc, miou, macc, iou, acc = calc_seg_metrics(
                    *[jnp.asarray(t) for t in totals[hi]])
                results[name] = dict(aacc=float(aacc), miou=float(miou),
                                     macc=float(macc))
                print(f"val[{name}] mIoU {float(miou):.4f} "
                      f"mAcc {float(macc):.4f} aAcc {float(aacc):.4f}")
            if results[test_head]["miou"] > best_miou:
                best_miou = results[test_head]["miou"]
                print(f"new best {test_head} mIoU: {best_miou:.4f}")
        print(f"epoch {epoch}, total time {time.time() - t0:.2f}")
        if args.max_steps and gstep >= args.max_steps:
            break
    return state


if __name__ == "__main__":
    main()
