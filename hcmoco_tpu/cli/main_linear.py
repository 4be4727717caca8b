"""Linear-probe CLI: frozen encoder + linear classifier.

Reference: `pycontrast/main_linear.py` + `learning/linear_trainer.py` —
encoder applied in test mode (pooled features, no projection head),
classifier trained with CE/SGD, top-1/top-5 reported.
"""

from __future__ import annotations

import time

import numpy as np

from .main_contrast import build_argparser, config_from_args


def main(argv=None):
    p = build_argparser()
    p.add_argument("--val_folder", type=str, default="")
    args = p.parse_args(argv)
    cfg = config_from_args(args)

    import jax
    import jax.numpy as jnp
    import optax
    from ..models.build import build_model
    from ..models.heads import LinearClassifier
    from ..parallel.mesh import make_mesh, shard_batch, replicated_sharding
    from ..train.schedules import learning_rate_fn
    from ..utils.meters import MetricLogger
    from ..data.pipeline import DataSource

    mesh = make_mesh()
    model = build_model(cfg)

    if args.synthetic:
        n = args.synthetic

        class Synth:
            def __len__(self):
                return n

            def __getitem__(self, i):
                rng = np.random.default_rng(i)
                return {
                    "rgbd": rng.standard_normal(
                        (cfg.crop_size, cfg.crop_size, 3)).astype(
                        np.float32),
                    "label": np.int32(i % cfg.n_class),
                    "index": np.int32(i),
                }

        train_ds = val_ds = Synth()
    else:
        from ..data.image_folder import ImageFolderDataset

        train_ds = ImageFolderDataset(
            f"{cfg.data_folder}/train", cfg.crop_size, train=True,
            seed=cfg.seed)
        val_ds = ImageFolderDataset(
            args.val_folder or f"{cfg.data_folder}/val", cfg.crop_size,
            train=False, seed=cfg.seed)

    steps = max(len(train_ds) // cfg.batch_size, 1)
    src = DataSource(train_ds, cfg.batch_size, np.ones(len(train_ds)),
                     seed=cfg.seed, num_workers=8)
    it = iter(src)
    example = next(it)

    rng = jax.random.PRNGKey(cfg.seed)
    mv = model.init(rng, example["rgbd"][:1], train=False)
    classifier = LinearClassifier(cfg.n_class)
    feat_dim = model.apply(mv, example["rgbd"][:1], train=False,
                           project=False)["pooled"].shape[-1]
    cv = classifier.init(jax.random.PRNGKey(cfg.seed + 1),
                         jnp.zeros((1, feat_dim)))

    lr_fn = learning_rate_fn(cfg, steps)
    tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay),
                     optax.trace(decay=cfg.momentum),
                     optax.scale_by_learning_rate(lr_fn))
    opt_state = tx.init(cv["params"])

    # load the pretrain encoder (key surgery analog, main_linear.py)
    if cfg.pretrain:
        from ..train.checkpoint import CheckpointManager
        # pretrain checkpoints hold a full TrainState; borrow its params
        import orbax.checkpoint as ocp
        raw = ocp.StandardCheckpointer().restore(cfg.pretrain)
        if "params" in raw:
            mv = {"params": raw["params"],
                  "batch_stats": raw.get("batch_stats", {})}
            print(f"=> loaded encoder from {cfg.pretrain}")

    @jax.jit
    def train_step(cls_params, opt_state, step, batch):
        def loss_fn(cp):
            feat = model.apply(mv, batch["rgbd"], train=False,
                               project=False)["pooled"]
            feat = jax.lax.stop_gradient(feat)
            logits = classifier.apply({"params": cp}, feat)
            logp = jax.nn.log_softmax(logits)
            ce = -jnp.take_along_axis(logp, batch["label"][:, None],
                                      axis=-1).mean()
            k = min(5, cfg.n_class)
            topk = jnp.argsort(-logits, axis=-1)[:, :k]
            hit = topk == batch["label"][:, None]
            return ce, (hit[:, 0].mean(), hit.any(-1).mean())

        (loss, (top1, top5)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(cls_params)
        updates, opt_state2 = tx.update(grads, opt_state, cls_params)
        return (optax.apply_updates(cls_params, updates), opt_state2,
                {"loss": loss, "top1": top1, "top5": top5,
                 "learning_rate": lr_fn(step)})

    @jax.jit
    def eval_step(cls_params, batch):
        feat = model.apply(mv, batch["rgbd"], train=False,
                           project=False)["pooled"]
        logits = classifier.apply({"params": cls_params}, feat)
        k = min(5, cfg.n_class)
        topk = jnp.argsort(-logits, axis=-1)[:, :k]
        hit = topk == batch["label"][:, None]
        return hit[:, 0].sum(), hit.any(-1).sum()

    def validate(cls_params):
        """LinearTrainer.validate (linear_trainer.py:193-242)."""
        n1 = n5 = n = 0
        from ..data.pipeline import collate

        for start in range(0, len(val_ds), cfg.batch_size):
            items = [val_ds[i] for i in
                     range(start, min(start + cfg.batch_size,
                                      len(val_ds)))]
            b = collate(items)
            h1, h5 = eval_step(cls_params, b)
            n1 += int(h1)
            n5 += int(h5)
            n += len(items)
        return n1 / max(n, 1), n5 / max(n, 1)

    logger = MetricLogger(None, print_freq=cfg.print_freq)
    cls_params = jax.device_put(cv["params"], replicated_sharding(mesh))
    opt_state = jax.device_put(opt_state, replicated_sharding(mesh))
    gstep = 0
    for epoch in range(1, cfg.epochs + 1):
        logger.reset()
        t0 = time.time()
        for i in range(steps):
            batch = shard_batch(next(it), mesh)
            cls_params, opt_state, metrics = train_step(
                cls_params, opt_state, gstep, batch)
            gstep += 1
            logger.log_step(epoch, i, steps,
                            {k: float(v) for k, v in metrics.items()},
                            n=cfg.batch_size)
            if args.max_steps and gstep >= args.max_steps:
                break
        top1, top5 = validate(cls_params)
        print(f" * epoch {epoch} Acc@1 {top1:.3f} Acc@5 {top5:.3f} "
              f"({time.time() - t0:.2f}s)")
        if args.max_steps and gstep >= args.max_steps:
            break
    return cls_params


if __name__ == "__main__":
    main()
