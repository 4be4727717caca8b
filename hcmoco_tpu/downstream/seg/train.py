"""Downstream human-parsing training/eval CLI.

Reference: `HRNet-Semantic-Segmentation/tools/train.py` + `tools/test.py` +
`lib/core/function.py` — SGD momentum 0.9 + poly LR (power 0.9), class-
weighted CE (or OHEM), per-epoch confusion-matrix validation, best-mIoU
checkpointing; test = sliding-window multi-scale + flip TTA.

Usage (depth parsing, NTURGBD-Parsing-4K recipe):
  python -m hcmoco_tpu.downstream.seg.train --root ... --train_list ... \
      --val_list ... --modality depth --epochs 150 --batch_size 80 \
      --learning_rate 7e-3 --pretrained <transfer_ckpt.pth>
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser("hcmoco_tpu downstream parsing")
    p.add_argument("--root", type=str, default="")
    p.add_argument("--train_list", type=str, default="")
    p.add_argument("--val_list", type=str, default="")
    p.add_argument("--modality", type=str, default="depth",
                   choices=["depth", "rgb"])
    p.add_argument("--dataset", type=str, default="nturgbd",
                   choices=["nturgbd", "human36m", "cityscapes", "lip",
                            "pascal_ctx"],
                   help="legacy cityscapes/lip/pascal_ctx loaders "
                        "(downstream/seg/legacy.py) batch-train like the "
                        "others; their val splits keep reference-original "
                        "label sizes, so evaluate them with --test_only")
    p.add_argument("--num_classes", type=int, default=25)
    p.add_argument("--crop", type=int, default=473)
    p.add_argument("--width", type=int, default=18)
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--batch_size", type=int, default=40)
    p.add_argument("--learning_rate", type=float, default=7e-3)
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--ohem", action="store_true")
    p.add_argument("--ohem_thres", type=float, default=0.9)
    p.add_argument("--ohem_keep", type=int, default=131072)
    p.add_argument("--pretrained", type=str, default="")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--max_steps", type=int, default=0)
    p.add_argument("--print_freq", type=int, default=10)
    p.add_argument("--eval_flip", action="store_true")
    p.add_argument("--test_only", action="store_true",
                   help="testval mode: sliding-window inference on the "
                        "val list (tools/test.py)")
    p.add_argument("--test_scales", type=str, default="1.0",
                   help="comma-separated multi-scale TTA factors")
    p.add_argument("--restore", type=str, default="",
                   help="npz weights from a previous run for --test_only")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax
    from .model import SegHRNet, load_pretrained
    from .criterion import (cross_entropy_seg, ohem_cross_entropy,
                            confusion_matrix, miou_from_confusion)
    from .datasets import ParsingDataset, Human36MParsing, CLASS_WEIGHTS_25
    from ...parallel.mesh import make_mesh, shard_batch, replicated_sharding
    from ...data.pipeline import DataSource
    from ...utils.meters import MetricLogger

    crop = args.crop
    model = SegHRNet(num_classes=args.num_classes, width=args.width,
                     dtype=jnp.float32 if args.synthetic else jnp.bfloat16)
    class_weights = jnp.asarray(CLASS_WEIGHTS_25[: args.num_classes],
                                jnp.float32)

    if args.synthetic:
        n = args.synthetic

        class Synth:
            def __len__(self):
                return n

            def __getitem__(self, i):
                rng = np.random.default_rng(i)
                return {
                    "image": rng.standard_normal(
                        (crop, crop, 3)).astype(np.float32),
                    "label": rng.integers(
                        0, args.num_classes, (crop, crop)).astype(np.int32),
                    "size": np.array([crop, crop], np.int32),
                    "index": np.int32(i),
                }

        train_ds = val_ds = Synth()
    elif args.dataset in ("cityscapes", "lip", "pascal_ctx"):
        from .legacy import (CityscapesParsing, LIPParsing,
                             PascalContextParsing)

        cls = {"cityscapes": CityscapesParsing, "lip": LIPParsing,
               "pascal_ctx": PascalContextParsing}[args.dataset]
        # ignore_label=255 matches this trainer's criterion convention
        # (the reference uses -1 for these sets; pure label-encoding delta)
        kw = dict(crop_size=(crop, crop), base_size=crop,
                  num_classes=args.num_classes, seed=args.seed,
                  ignore_label=255)
        train_ds = cls(args.root, args.train_list, is_train=True, **kw)
        val_ds = cls(args.root, args.val_list, is_train=False, **kw)
        # cityscapes ships hardcoded class weights (cityscapes.py:42-45);
        # lip/pascal_ctx train unweighted
        class_weights = (jnp.asarray(train_ds.class_weights)
                         if train_ds.class_weights is not None else None)
    else:
        cls = Human36MParsing if args.dataset == "human36m" \
            else ParsingDataset
        train_ds = cls(args.root, args.train_list, modality=args.modality,
                       crop_size=(crop, crop), base_size=crop,
                       num_classes=args.num_classes, is_train=True,
                       seed=args.seed)
        val_ds = cls(args.root, args.val_list, modality=args.modality,
                     crop_size=(crop, crop), base_size=crop,
                     num_classes=args.num_classes, is_train=False,
                     seed=args.seed)

    steps = max(len(train_ds) // args.batch_size, 1)
    max_iters = steps * args.epochs
    src = DataSource(train_ds, args.batch_size, np.ones(len(train_ds)),
                     seed=args.seed, num_workers=8)
    it = iter(src)
    example = next(it)

    mesh = make_mesh()
    variables = model.init(jax.random.PRNGKey(args.seed),
                           example["image"][:1], train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if args.pretrained:
        params, batch_stats, nload = load_pretrained(
            args.pretrained, params, batch_stats)
        print(f"=> loaded {nload} conv tensors from {args.pretrained}")

    lr_fn = lambda step: args.learning_rate * (  # noqa: E731
        1.0 - jnp.minimum(step, max_iters - 1) / max_iters) ** 0.9
    tx = optax.chain(optax.add_decayed_weights(args.weight_decay),
                     optax.trace(decay=args.momentum),
                     optax.scale_by_learning_rate(lr_fn))
    opt_state = tx.init(params)

    loss_impl = ohem_cross_entropy if args.ohem else cross_entropy_seg

    if args.test_only:
        # testval: per-image sliding-window multi-scale (+flip) inference
        # (tools/test.py:51-138, base_dataset.multi_scale_inference)
        from .inference import sliding_window_inference
        from .datasets import mapped_pairs

        if args.restore:
            import orbax.checkpoint as ocp
            raw = ocp.StandardCheckpointer().restore(args.restore)
            params, batch_stats = raw["params"], raw.get("batch_stats", {})
            print(f"=> restored weights from {args.restore}")

        scales = tuple(float(s) for s in args.test_scales.split(","))
        pairs = mapped_pairs() if args.modality == "depth" else None

        def apply_fn(x):
            return model.apply({"params": params,
                                "batch_stats": batch_stats}, x,
                               train=False)

        conf = np.zeros((args.num_classes, args.num_classes), np.float64)
        import jax.numpy as jnp2
        for i in range(len(val_ds)):
            s = val_ds[i]
            probs = sliding_window_inference(
                apply_fn, s["image"], args.num_classes,
                crop_size=(crop, crop), scales=scales,
                flip=args.eval_flip, flip_pairs=pairs)
            import cv2
            pred = cv2.resize(probs, (s["label"].shape[1],
                                      s["label"].shape[0]),
                              interpolation=cv2.INTER_LINEAR).argmax(-1)
            conf += np.asarray(confusion_matrix(
                jnp2.asarray(pred)[None], jnp2.asarray(s["label"])[None],
                args.num_classes), np.float64)
        miou, iou = miou_from_confusion(jnp2.asarray(conf, jnp2.float32))
        print(f"testval mIoU: {float(miou):.4f}")
        for ci, v in enumerate(np.asarray(iou)):
            print(f"  class {ci}: IoU {float(v):.4f}")
        return None, None

    @jax.jit
    def train_step(params, batch_stats, opt_state, step, batch):
        def loss_fn(p):
            logits, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch["image"], train=True, mutable=["batch_stats"])
            if args.ohem:
                loss = loss_impl(logits, batch["label"], class_weights,
                                 thres=args.ohem_thres,
                                 min_kept=args.ohem_keep)
            else:
                loss = loss_impl(logits, batch["label"], class_weights)
            return loss, (mutated["batch_stats"], {"loss": loss})

        (_, (new_bs, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt2 = tx.update(grads, opt_state, params)
        metrics["learning_rate"] = lr_fn(step)
        return optax.apply_updates(params, updates), new_bs, opt2, metrics

    @jax.jit
    def eval_step(params, batch_stats, batch):
        logits = model.apply({"params": params,
                              "batch_stats": batch_stats},
                             batch["image"], train=False)
        h, w = batch["label"].shape[1], batch["label"].shape[2]
        logits = jax.image.resize(
            logits.astype(jnp.float32),
            (logits.shape[0], h, w, logits.shape[-1]), "bilinear")
        pred = jnp.argmax(logits, axis=-1)
        return confusion_matrix(pred, batch["label"], args.num_classes)

    logger = MetricLogger(None, print_freq=args.print_freq)
    rep = replicated_sharding(mesh)
    params = jax.device_put(params, rep)
    batch_stats = jax.device_put(batch_stats, rep)
    opt_state = jax.device_put(opt_state, rep)

    best_miou = -1.0
    gstep = 0
    for epoch in range(1, args.epochs + 1):
        logger.reset()
        t0 = time.time()
        for i in range(steps):
            batch = shard_batch(next(it), mesh)
            params, batch_stats, opt_state, metrics = train_step(
                params, batch_stats, opt_state, gstep, batch)
            gstep += 1
            logger.log_step(epoch, i, steps,
                            {k: float(v) for k, v in metrics.items()},
                            n=args.batch_size)
            if args.max_steps and gstep >= args.max_steps:
                break

        # validation: confusion-matrix mIoU (function.py:89-136)
        vsrc = DataSource(val_ds, args.batch_size, np.ones(len(val_ds)),
                          seed=args.seed + 1, num_workers=8)
        vit = iter(vsrc)
        conf = np.zeros((args.num_classes, args.num_classes), np.float64)
        for _ in range(max(len(val_ds) // args.batch_size, 1)):
            vb = shard_batch(next(vit), mesh)
            conf += np.asarray(eval_step(params, batch_stats, vb),
                               np.float64)
        miou, _ = miou_from_confusion(jnp.asarray(conf, jnp.float32))
        miou = float(miou)
        flag = ""
        if miou > best_miou:
            best_miou = miou
            flag = " (best)"
            if args.restore:
                import os
                import orbax.checkpoint as ocp
                path = os.path.abspath(args.restore)
                ocp.StandardCheckpointer().save(
                    path, {"params": jax.device_get(params),
                           "batch_stats": jax.device_get(batch_stats)},
                    force=True)
        print(f"epoch {epoch}: mIoU {miou:.4f}{flag}, best {best_miou:.4f},"
              f" time {time.time() - t0:.2f}")
        if args.max_steps and gstep >= args.max_steps:
            break
    return params, batch_stats


if __name__ == "__main__":
    main()
