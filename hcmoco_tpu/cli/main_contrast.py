"""Contrastive pre-training CLI.

Reference: `pycontrast/main_contrast.py` + the option surface of
`pycontrast/options/{base,train}_options.py` (same flag names where they
still make sense; SLURM/NCCL flags are gone — the mesh covers all local
devices, multi-host joins via `jax.distributed.initialize` automatically).

Usage:
  python -m hcmoco_tpu.cli.main_contrast --method CMCRGBD2S --arch HRNet \
      --dataset NTUMPII --data_folder ... --train_file_list ... [...]
  python -m hcmoco_tpu.cli.main_contrast --recipe first_stage/ntumpiirgbd2s_hrnet_w18
  python -m hcmoco_tpu.cli.main_contrast --synthetic 512 ...   # no data needed
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("hcmoco_tpu contrastive pretraining")
    p.add_argument("--recipe", type=str, default="",
                   help="named recipe from core.config.RECIPES; other flags "
                        "override it")
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic samples (no dataset files)")
    # mirrored reference flags (options/base_options.py)
    p.add_argument("--method", type=str, default=None)
    p.add_argument("--modal", type=str, default=None)
    p.add_argument("--arch", type=str, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--head", type=str, default=None)
    p.add_argument("--feat_dim", type=int, default=None)
    p.add_argument("--mem", type=str, default=None)
    p.add_argument("--nce_k", "-k", type=int, default=None)
    p.add_argument("--nce_m", "-m", type=float, default=None)
    p.add_argument("--nce_t", "-t", type=float, default=None)
    p.add_argument("--temperature", type=float, default=None)
    p.add_argument("--alpha", type=float, default=None)
    p.add_argument("--pri3d_num_samples_per_image", type=int, default=None)
    p.add_argument("--scl_groups", type=int, default=None,
                   help="cross-subject SCL group count; 0 (default) = one "
                        "group per data-mesh shard (reference per-GPU "
                        "semantics), 1 = global batch")
    p.add_argument("--modality_missing", type=int, default=None)
    p.add_argument("--linear_feat_map", type=int, default=None)
    p.add_argument("--pool_method", type=str, default=None)
    p.add_argument("--skeleton_meta_name", type=str, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--lr_decay_epochs", type=str, default=None)
    p.add_argument("--lr_decay_rate", type=float, default=None)
    p.add_argument("--weight_decay", type=float, default=None)
    p.add_argument("--momentum", type=float, default=None)
    p.add_argument("--cosine", action="store_true", default=None)
    p.add_argument("--warm", action="store_true", default=None)
    p.add_argument("--dataset", type=str, default=None)
    p.add_argument("--data_folder", type=str, default=None)
    p.add_argument("--train_file_list", type=str, default=None)
    p.add_argument("--mpii_root", type=str, default=None)
    p.add_argument("--coco_root", type=str, default=None)
    p.add_argument("--seg_root", type=str, default=None)
    p.add_argument("--seg_file_list", type=str, default=None)
    p.add_argument("--aug", type=str, default=None)
    p.add_argument("--crop_size", type=int, default=None)
    p.add_argument("--random_flip", type=int, default=None)
    p.add_argument("--not_use_weighted_sampler", action="store_true",
                   default=None)
    # versatility / segmentation (main_segmentor.py surface)
    p.add_argument("--n_class", type=int, default=None)
    p.add_argument("--supervise_type", type=int, default=None)
    p.add_argument("--test_type", type=int, default=None)
    p.add_argument("--mask_seg_depth", action="store_true", default=None)
    p.add_argument("--mask_seg_rgb", action="store_true", default=None)
    p.add_argument("--cmc_loss_weights", type=float, default=None)
    p.add_argument("--other_loss_weights", type=float, default=None)
    p.add_argument("--seg_val_file_list", type=str, default=None)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--pretrain", type=str, default=None)
    p.add_argument("--IN_Pretrain", type=str, default="")
    p.add_argument("--depth_Pretrain", type=str, default="")
    p.add_argument("--save_freq", type=int, default=None)
    p.add_argument("--print_freq", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--compute_dtype", type=str, default=None)
    p.add_argument("--microbatch", type=int, default=None,
                   help="scan-microbatched step: split each batch into N "
                        "sequential microbatches inside one executable "
                        "(grad accumulation; activation residency = one "
                        "microbatch)")
    p.add_argument("--num_workers", "-j", type=int, default=8)
    p.add_argument("--max_steps", type=int, default=0,
                   help="stop after N optimizer steps (smoke runs)")
    p.add_argument("--deterministic_data", action="store_true",
                   help="fixed-seed data order for loss-curve parity runs")
    p.add_argument("--profile_dir", type=str, default="",
                   help="capture a jax.profiler trace of steps 10-15 "
                        "into this directory")
    p.add_argument("--multihost", action="store_true",
                   help="join a multi-host TPU slice via "
                        "jax.distributed.initialize (replaces the "
                        "reference's SLURM rendezvous)")
    return p


def config_from_args(args) -> "TrainConfig":
    from ..core.config import TrainConfig, RECIPES, resolve_config

    if args.recipe and args.recipe not in RECIPES:
        import sys
        sys.exit(f"error: unknown --recipe '{args.recipe}'. Available:\n  "
                 + "\n  ".join(sorted(RECIPES)))
    cfg = RECIPES[args.recipe] if args.recipe else TrainConfig()
    overrides = {}
    for f in dataclasses.fields(TrainConfig):
        v = getattr(args, f.name, None)
        if v is not None:
            if f.name == "lr_decay_epochs" and isinstance(v, str):
                v = tuple(int(x) for x in v.split(","))
            elif f.type in ("bool",) or isinstance(f.default, bool):
                v = bool(v)
            overrides[f.name] = v
    cfg = dataclasses.replace(cfg, **overrides)
    return resolve_config(cfg)


def main(argv=None):
    args = build_argparser().parse_args(argv)
    cfg = config_from_args(args)

    import jax

    if args.multihost:
        # one line replaces base_trainer.init_ddp_environment's SLURM
        # scontrol/env parsing (base_trainer.py:20-73): the TPU runtime
        # discovers peers, the mesh then spans all hosts over DCN.
        jax.distributed.initialize()
    from ..core.config import to_dict
    from ..models.build import build_model
    from ..parallel.mesh import make_mesh, shard_batch, replicated_sharding
    from ..train.state import create_train_state
    from ..train.contrast_step import make_contrast_train_step
    from ..train.checkpoint import CheckpointManager
    from ..utils.meters import MetricLogger
    from ..data.synthetic import SyntheticContrastSource

    print("----------------- Options ---------------")
    for k, v in sorted(to_dict(cfg).items()):
        print(f"{k:>35}: {v}")
    print("----------------- End -------------------")

    if args.synthetic:
        n_data = args.synthetic
        source = SyntheticContrastSource(
            cfg.batch_size, size=cfg.crop_size,
            num_joints=cfg.num_joints, n_data=n_data, seed=cfg.seed,
            modal=cfg.modal)
        steps_per_epoch = max(n_data // cfg.batch_size, 1)
    else:
        from ..data.pipeline import build_contrast_source

        source, n_data, steps_per_epoch = build_contrast_source(cfg)

    mesh = make_mesh()
    n_shards = mesh.shape["data"]
    if cfg.batch_size % n_shards:
        import sys
        sys.exit(f"error: --batch_size {cfg.batch_size} must be divisible "
                 f"by the {n_shards}-device 'data' mesh axis")
    model = build_model(cfg)
    it = iter(source)
    example = next(it)

    rng = jax.random.PRNGKey(cfg.seed)
    state = create_train_state(cfg, model, rng, example, n_data,
                               steps_per_epoch)
    if args.IN_Pretrain or args.depth_Pretrain:
        from ..export.transfer import load_imagenet_pretrained

        encs = []
        if args.IN_Pretrain:
            encs.append(("encoder1", args.IN_Pretrain))
        if args.depth_Pretrain:
            encs.append(("encoder2", args.depth_Pretrain))
        params, bs = state.params, state.batch_stats
        for enc, path in encs:
            params, bs, n = load_imagenet_pretrained(
                path, params, bs, encoder_names=(enc,))
            print(f"=> loaded {n} conv tensors into {enc} from {path}")
        state = state.replace(params=params, batch_stats=bs)

    if cfg.pretrain:
        # stage-1 -> stage-2 warm start with partial grafting
        # (main_contrast.py:52-67 key-surgery analog)
        from ..train.checkpoint import graft_pretrain

        state = graft_pretrain(cfg.pretrain, state)

    ckpt_dir = f"{cfg.model_path}/{cfg.model_name}"
    ckpt = CheckpointManager(ckpt_dir, save_freq=cfg.save_freq)
    start_epoch = 1
    if cfg.resume:
        state, last = ckpt.restore(state)
        start_epoch = last + 1
        if last:
            print(f"=> resumed from epoch {last}")

    state = jax.device_put(state, replicated_sharding(mesh))
    step_fn = make_contrast_train_step(cfg, model, steps_per_epoch,
                                       mesh=mesh)
    logger = MetricLogger(ckpt_dir, print_freq=cfg.print_freq)

    data_rng = jax.random.PRNGKey(cfg.seed + 1)
    global_step = int(state.step)
    for epoch in range(start_epoch, cfg.epochs + 1):
        t0 = time.time()
        logger.reset()
        for i in range(steps_per_epoch):
            batch = shard_batch(next(it), mesh)
            step_rng = jax.random.fold_in(data_rng, global_step)
            if args.profile_dir and global_step == 10:
                jax.profiler.start_trace(args.profile_dir)
            state, metrics = step_fn(state, batch, step_rng)
            if args.profile_dir and global_step == 15:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                print(f"profiler trace written to {args.profile_dir}")
            global_step += 1
            logger.log_step(
                epoch, i, steps_per_epoch,
                {k: float(v) for k, v in metrics.items()},
                n=cfg.batch_size)
            if args.max_steps and global_step >= args.max_steps:
                break
        logger.write_epoch(epoch)
        ckpt.save(epoch, jax.device_get(state))
        print(f"epoch {epoch}, total time {time.time() - t0:.2f}")
        if args.max_steps and global_step >= args.max_steps:
            break
    return state


if __name__ == "__main__":
    main()
