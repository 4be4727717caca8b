"""A2J ITOP training CLI.

Reference: `A2J/main.py:286-391` — Adam(3.5e-4, wd=1e-4), StepLR(10, 0.2),
batch 12, losses = Cls_loss + Reg_loss*RegLossFactor(3), in-loop PCK@10cm
eval.  Loads the pretrain HRNet via the export bridge (`--pretrained_pth`,
the transfer_ckpt output).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser("hcmoco_tpu A2J ITOP trainer")
    p.add_argument("--train_dir", type=str, default="")
    p.add_argument("--test_dir", type=str, default="")
    p.add_argument("--bndbox_train", type=str, default="")
    p.add_argument("--bndbox_test", type=str, default="")
    p.add_argument("--pretrained_pth", type=str, default="")
    p.add_argument("--width", type=int, default=18)
    p.add_argument("--arch", type=str, default="hrnet",
                   choices=("hrnet", "resnet50"),
                   help="hrnet = HCMoCo's A2J_HRNet_model (stride-4 "
                        "anchors, main.py:289-295); resnet50 = the legacy "
                        "A2J_model (stride-16 anchors, main.py:296-300)")
    p.add_argument("--epochs", type=int, default=35)
    p.add_argument("--batch_size", type=int, default=12)
    p.add_argument("--learning_rate", type=float, default=3.5e-4)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--lr_step", type=int, default=10)
    p.add_argument("--lr_gamma", type=float, default=0.2)
    p.add_argument("--reg_loss_factor", type=float, default=3.0)
    p.add_argument("--spatial_factor", type=float, default=0.5)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--max_steps", type=int, default=0)
    p.add_argument("--crop", type=int, default=288)
    p.add_argument("--print_freq", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval_first", action="store_true",
                   help="evaluate PCK@10cm before training (epoch 0) to "
                        "establish the untrained baseline")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax
    from .model import A2JHRNet, A2JResNet
    from .anchors import generate_anchors, shift_anchors, post_process, \
        a2j_loss
    from .data import ITOPDataset, KEYPOINTS, DEPTH_FACTOR
    from ...parallel.mesh import make_mesh, shard_batch, replicated_sharding
    from ...data.pipeline import DataSource
    from ...utils.meters import MetricLogger

    crop = args.crop
    dtype = jnp.float32 if args.synthetic else jnp.bfloat16
    if args.arch == "resnet50":
        # legacy configuration (A2J/main.py:296-300): 16 default anchors
        # ([2,6,10,14]^2) per stride-16 cell
        anchors = jnp.asarray(shift_anchors(
            (crop // 16, crop // 16), 16, generate_anchors(None, None)),
            jnp.float32)
        model = A2JResNet(num_classes=KEYPOINTS, num_anchors=16,
                          dtype=dtype)
    else:
        p_hw = np.array([1, 2, 3])
        anchors = jnp.asarray(shift_anchors(
            (crop // 4, crop // 4), 4, generate_anchors(p_hw, p_hw)),
            jnp.float32)
        model = A2JHRNet(num_classes=KEYPOINTS, num_anchors=9,
                         width=args.width, dtype=dtype)

    if args.synthetic:
        n = args.synthetic

        class Synth:
            def __len__(self):
                return n

            def __getitem__(self, i):
                rng = np.random.default_rng(i)
                return {
                    "depth": rng.standard_normal(
                        (crop, crop, 1)).astype(np.float32),
                    "label": np.concatenate([
                        rng.uniform(0, crop, (KEYPOINTS, 2)),
                        rng.standard_normal((KEYPOINTS, 1)) * DEPTH_FACTOR,
                    ], -1).astype(np.float32),
                    "keypoints_world": rng.standard_normal(
                        (KEYPOINTS, 3)).astype(np.float32),
                    "mean": np.float32(2.0),
                    "index": np.int32(i),
                }

        train_ds = Synth()
    else:
        import pickle

        with open(args.bndbox_train, "rb") as f:
            bndbox = np.asarray(pickle.load(f))
        train_ds = ITOPDataset(args.train_dir, bndbox, augment=True,
                               seed=args.seed)

    steps = max(len(train_ds) // args.batch_size, 1)
    src = DataSource(train_ds, args.batch_size, np.ones(len(train_ds)),
                     seed=args.seed, num_workers=8)
    it = iter(src)
    example = next(it)

    mesh = make_mesh()
    variables = model.init(jax.random.PRNGKey(args.seed),
                           example["depth"][:1], train=False)
    params, batch_stats = variables["params"], variables.get(
        "batch_stats", {})

    if args.pretrained_pth:
        import torch
        from ...export.transfer import hrnet_torch_to_flax

        sd = {k: v.numpy() for k, v in
              torch.load(args.pretrained_pth, map_location="cpu").items()}
        bp, bs, nload = hrnet_torch_to_flax(sd, params["Backbone"],
                                            batch_stats.get("Backbone", {}))
        params = dict(params)
        params["Backbone"] = bp
        batch_stats = dict(batch_stats)
        batch_stats["Backbone"] = bs
        print(f"=> loaded {nload} conv tensors from {args.pretrained_pth}")

    # StepLR(step=10 epochs, gamma=0.2) (A2J/main.py:302)
    lr_fn = optax.exponential_decay(
        args.learning_rate, transition_steps=args.lr_step * steps,
        decay_rate=args.lr_gamma, staircase=True)
    # torch Adam(weight_decay=wd) couples L2 into the gradient (not AdamW)
    tx = optax.chain(optax.add_decayed_weights(args.weight_decay),
                     optax.scale_by_adam(),
                     optax.scale_by_learning_rate(lr_fn))
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, step, batch):
        def loss_fn(p):
            heads, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch["depth"], train=True, mutable=["batch_stats"])
            cls_l, reg_l = a2j_loss(heads, batch["label"], anchors,
                                    spatial_factor=args.spatial_factor)
            loss = cls_l + reg_l * args.reg_loss_factor
            return loss, (mutated["batch_stats"],
                          {"loss": loss, "cls_loss": cls_l,
                           "reg_loss": reg_l})

        (_, (new_bs, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt2 = tx.update(grads, opt_state, params)
        metrics["learning_rate"] = lr_fn(step)
        return (optax.apply_updates(params, updates), new_bs, opt2,
                metrics)

    @jax.jit
    def predict_step(params, batch_stats, batch):
        heads = model.apply({"params": params, "batch_stats": batch_stats},
                            batch["depth"], train=False)
        return post_process(heads, anchors)

    def evaluate(params, batch_stats):
        """In-loop PCK@10cm over the test set (A2J/main.py:365-386)."""
        import scipy.io as scio
        from .data import evaluation_10cm

        bnd = np.asarray(scio.loadmat(args.bndbox_test)["FRbndbox_test"]) \
            if args.bndbox_test.endswith(".mat") else \
            np.asarray(__import__("pickle").load(open(args.bndbox_test,
                                                      "rb")))
        test_ds = ITOPDataset(args.test_dir, bnd, augment=False)
        preds, worlds, means = [], [], []
        for start in range(0, len(test_ds), args.batch_size):
            items = [test_ds[i] for i in
                     range(start, min(start + args.batch_size,
                                      len(test_ds)))]
            from ...data.pipeline import collate
            b = collate(items)
            preds.append(np.asarray(predict_step(params, batch_stats, b)))
            worlds.append(b["keypoints_world"])
            means.append(b["mean"])
        pred = np.concatenate(preds)
        # de-normalize depth happens inside evaluation_10cm via means
        acc, per_joint = evaluation_10cm(
            pred, np.concatenate(worlds),
            bnd[: len(pred)], np.concatenate(means), per_joint=True)
        return acc, per_joint

    logger = MetricLogger(None, print_freq=args.print_freq)
    rep = replicated_sharding(mesh)
    params = jax.device_put(params, rep)
    batch_stats = jax.device_put(batch_stats, rep)
    opt_state = jax.device_put(opt_state, rep)
    best_acc = -1.0
    gstep = 0
    if args.eval_first and args.test_dir and args.bndbox_test:
        acc, _ = evaluate(params, batch_stats)
        print(f"epoch 0: PCK@10cm {acc:.4f} (untrained baseline)")
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
        if args.test_dir and args.bndbox_test:
            acc, _ = evaluate(params, batch_stats)
            flag = ""
            if acc > best_acc:
                best_acc = acc
                flag = " (best)"
            print(f"epoch {epoch}: PCK@10cm {acc:.4f}{flag}")
        print(f"epoch {epoch}, total time {time.time() - t0:.2f}")
        if args.max_steps and gstep >= args.max_steps:
            break
    return params, batch_stats


if __name__ == "__main__":
    main()
