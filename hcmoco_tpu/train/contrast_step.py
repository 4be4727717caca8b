"""The jitted contrastive pre-training step (stages 1 & 2 + moco).

Behavioral spec: `pycontrast/learning/contrast_trainer.py` —
`_train_mem_skeleton3d` (:532-640, stage 1), `_train_bank_joints_pri3d_cmc3`
(:894-1039, stage 2), `_train_moco` (:255-392) — re-designed as ONE pure
function (state, batch, rng) -> (state, metrics) compiled once by XLA:

  * the reference's per-step `dist.all_gather` of features+indices
    (:577-579, :949-951) disappears: the program is written in the global
    batch view; GSPMD inserts the all-gather over ICI where the replicated
    memory-bank update consumes sharded per-example features.
  * DDP's gradient all-reduce becomes the implicit psum of the global-mean
    loss gradient.
  * the memory-bank EMA update is a deterministic functional scatter applied
    identically on every shard — the same replicated-bank invariant the
    reference maintains via broadcast-once + identical updates.
  * BatchNorm statistics are computed over the GLOBAL batch (sync-BN).  The
    reference uses per-GPU BN in the bank paths; cross-replica stats are the
    TPU-native choice and remove the need for ShuffleBN (documented delta,
    SURVEY.md §7 hard-part 5).
  * all data-dependent python branches (`use_depth.sum()==0` etc.) are
    masked arithmetic inside the losses (see contrast/losses.py).

Batch dict fields (from datasets/dataset.py:614-617 9-tuple, renamed):
  rgbd (B,H,W,6) f32 | index (B,) i32 | skeleton (B,J,2) f32 |
  joints3d (B,J,3) | joints2d (B,J,2) original-res (row,col) |
  joints_vis (B,J) i32 | use_depth (B,) i32 (true_depth) |
  depth_mask (B,H,W) f32 | scale (B,) f32 | use_rgb (B,) i32 (optional)
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import optax

from ..core.config import TrainConfig
from ..contrast.memory import (
    MemoryState, cmc3_forward, cmc3_losses_counts, memory_logits,
    sample_negative_indices, update_memory, moco_logits, moco_enqueue,
)
from ..contrast.losses import (
    compute_loss_accuracy, masked_six_way, soft_pri3d_loss,
    joints_pri3d_loss, cross_subject_scl_loss, nce_loss_and_acc,
)
from .state import TrainState, make_optimizer


# numpy (NOT jnp) constants: a module-scope jnp.asarray would initialize
# the JAX backend at import time, defeating the post-import
# jax.config.update('jax_platforms', 'cpu') switch this image relies on
from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD  # noqa: E402


def device_normalize(batch):
    """Datasets may ship raw uint8 rgb + uint16 depth-mm (4.7x fewer
    host->device bytes than normalized f32 rgbd); normalization then fuses
    into the first conv on device.  Same math as the host path
    (transforms.normalize_rgb + depth/1000 x3, dataset.py:139-160)."""
    if "rgb_u8" not in batch:
        return batch
    batch = dict(batch)
    rgb = batch.pop("rgb_u8").astype(jnp.float32) / 255.0
    rgb = (rgb - IMAGENET_MEAN) / IMAGENET_STD
    d = batch.pop("depth_mm").astype(jnp.float32) / 1000.0
    batch["rgbd"] = jnp.concatenate(
        [rgb, jnp.repeat(d[..., None], 3, axis=-1)], axis=-1)
    return batch


def _apply(model, params, batch_stats, *args, train=True, rngs=None,
           **kwargs):
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    out, mutated = model.apply(
        variables, *args, train=train, mutable=["batch_stats"],
        rngs=rngs, **kwargs)
    return out, mutated.get("batch_stats", batch_stats)


def _scl_grouped(lm1, lm2, joints2d, use_depth, use_rgb, temperature,
                 groups: int):
    """Cross-subject SCL, optionally over `groups` equal batch slices to
    reproduce the reference's per-GPU-batch positives (DDP computes SCL on
    the local batch only).  groups=1 = whole global batch."""
    if groups <= 1:
        return cross_subject_scl_loss(lm1, lm2, joints2d, use_depth,
                                      use_rgb, temperature)
    b = lm1.shape[0]
    g = groups
    bs = b // g

    def one(args):
        m1, m2, j2, ud, ur = args
        return cross_subject_scl_loss(m1, m2, j2, ud, ur, temperature)

    losses = jax.vmap(lambda m1, m2, j2, ud, ur: cross_subject_scl_loss(
        m1, m2, j2, ud, ur, temperature))(
        lm1.reshape(g, bs, *lm1.shape[1:]),
        lm2.reshape(g, bs, *lm2.shape[1:]),
        joints2d.reshape(g, bs, *joints2d.shape[1:]),
        use_depth.reshape(g, bs),
        use_rgb.reshape(g, bs),
    )
    return losses.mean()


def make_contrast_train_step(cfg: TrainConfig, model,
                             steps_per_epoch: int,
                             scl_groups: int = None,
                             donate: bool = False,
                             mesh=None):
    """Build the jittable train step for cfg.mem in
    {'bank', 'bank+jointspri3d', 'moco'}.

    donate=True donates the TrainState buffers to the step (in-place
    update on device — saves one params+opt+bank copy per step); callers
    must not reuse the input state afterwards.

    mesh: pass the execution Mesh when running multi-device — it pins the
    counts-mode negative sampler to replicated compute (see
    memory.sample_negative_counts: without it GSPMD puts an all-reduce in
    every binomial rejection-loop condition).

    scl_groups: None (default) derives from cfg.scl_groups — 0 = one group
    per data-mesh shard, reproducing the reference's per-GPU local-batch
    SCL (contrast_trainer.py:830-892)."""
    if scl_groups is None:
        scl_groups = cfg.scl_groups
    if scl_groups == 0:
        scl_groups = (dict(mesh.shape).get("data", 1)
                      if mesh is not None else 1)
    tx, lr_fn = make_optimizer(cfg, steps_per_epoch)
    replicated = None
    if mesh is not None and mesh.size > 1:
        # single-device meshes skip the constraint: the sharding
        # custom-calls inhibit fusion in the sampler (~15% step cost on the
        # 1-chip bench) and there is nothing to replicate
        from jax.sharding import NamedSharding, PartitionSpec

        replicated = NamedSharding(mesh, PartitionSpec())
    stage2 = cfg.mem == "bank+jointspri3d"
    is_moco = cfg.mem == "moco"
    tri_modal = cfg.modal == "RGBD2S"

    def loss_fn(params, batch_stats, memory: MemoryState, batch, rng):
        batch = device_normalize(batch)
        rngs = jax.random.split(rng, 3)
        metrics: Dict[str, jnp.ndarray] = {}
        y = batch["index"]
        # CMC/RGB baseline memory_logits formulation: dense score matrix
        # (round-1 default, no (bsz, K+1, dim) row materialization) unless
        # the user pinned 'gather' or the dataset is too large for dense
        baseline_dense = ((cfg.dense_scores or cfg.bank_logits != "gather")
                          and memory.n_data <= cfg.counts_max_n_data)
        loss_weights = None
        use_depth = batch.get("use_depth") if cfg.modality_missing else None
        use_rgb = batch.get("use_rgb")

        if tri_modal:
            if cfg.arch == "HRNetPN":
                # point-cloud branch needs crop-tracked pixel coords +
                # per-sample depth mean (_train_mem_skeleton3d :557-561)
                out, new_bs = _apply(
                    model, params, batch_stats, batch["rgbd"],
                    batch["skeleton"], batch["depth_mask"],
                    batch["grid_xy"], cfg.pn_ori_h, cfg.pn_ori_w,
                    batch["depth_mean"], train=True,
                    rngs={"points": rngs[2]},
                    return_fm=stage2 and cfg.linear_feat_map)
            else:
                def fwd(p, bs, rgbd, skel):
                    return _apply(model, p, bs, rgbd, skel, train=True,
                                  return_fm=stage2 and cfg.linear_feat_map)

                if cfg.remat:
                    # trade FLOPs for HBM: drop activations in the forward
                    # and recompute them in the backward, unlocking larger
                    # batches.  'conv_out' keeps every pre-BN conv output
                    # (ConvBN names them) so only elementwise BN/ReLU/resize
                    # ops re-run — convs are never recomputed.
                    if cfg.remat_policy == "conv_out":
                        policy = (jax.checkpoint_policies
                                  .save_only_these_names("conv_out"))
                    else:
                        policy = (jax.checkpoint_policies
                                  .dots_with_no_batch_dims_saveable)
                    fwd = jax.checkpoint(fwd, policy=policy)
                out, new_bs = fwd(params, batch_stats, batch["rgbd"],
                                  batch["skeleton"])
            feats = jnp.stack([out["feat1"], out["feat2"], out["feat3"]])
            mode = "dense" if cfg.dense_scores else cfg.bank_logits
            if (mode in ("counts", "dense", "hybrid")
                    and memory.n_data > cfg.counts_max_n_data):
                # these modes build (bsz, n_data) intermediates (score
                # matrices / counts); for very large datasets only the
                # row-gather formulation stays O(bsz * K * dim)
                mode = "gather"
            mask_kw = dict(use_depth=use_depth,
                           use_rgb=use_rgb if stage2 is False else None)
            if mode == "counts" and batch.get("neg_idx") is None:
                # gather-free count-weighted NCE (same estimator; see
                # contrast/memory.py::cmc3_losses_counts) + the usual
                # replicated bank EMA update
                per_sample = cmc3_losses_counts(
                    feats, memory.banks, y, rngs[0], k=cfg.nce_k,
                    temperature=cfg.nce_t, replicated=replicated)
                losses, accs = masked_six_way(per_sample, **mask_kw)
                new_memory = MemoryState(banks=jnp.stack([
                    update_memory(memory.banks[i], feats[i], y, cfg.nce_m)
                    for i in range(3)]))
            else:
                if mode == "counts":
                    mode = "dense"  # pinned neg_idx (parity harness)
                # global view: f == all_f (GSPMD gathers where needed)
                logits, new_memory = cmc3_forward(
                    memory, feats, y, feats, y, rngs[0],
                    k=cfg.nce_k, temperature=cfg.nce_t, m=cfg.nce_m,
                    neg_idx=batch.get("neg_idx"), mode=mode)
                losses, accs = compute_loss_accuracy(logits, **mask_kw)
            names = ["12", "21", "23", "32", "13", "31"]
        elif cfg.modal == "CMC":
            apply_kw = {}
            if cfg.jigsaw and "rgbd_jig" in batch:
                # CMCMultiHeads (build_backbone.py:148-184): PIRL patch
                # stack through both encoders + per-modality jigsaw heads
                bsz = y.shape[0]
                perms = jax.vmap(
                    lambda k: jax.random.permutation(k, 9))(
                    jax.random.split(rngs[2], bsz))
                shuffle_ids = (perms
                               + jnp.arange(bsz)[:, None] * 9).reshape(-1)
                xj = batch["rgbd_jig"]
                apply_kw = {"x_jig": xj.reshape(-1, *xj.shape[2:]),
                            "shuffle_ids": shuffle_ids}
            out, new_bs = _apply(model, params, batch_stats, batch["rgbd"],
                                 train=True, **apply_kw)
            idx = sample_negative_indices(rngs[0], y, memory.n_data,
                                          cfg.nce_k)
            # CMCMem.forward (mem_bank.py:109-154): cross-modal logits
            logits = [
                memory_logits(out["feat1"], memory.banks[1], idx, cfg.nce_t,
                              baseline_dense),
                memory_logits(out["feat2"], memory.banks[0], idx, cfg.nce_t,
                              baseline_dense),
            ]
            names = ["12", "21"]
            if "feat1_jig" in out:
                # the reference trainer swaps the jig args into CMCMem
                # (contrast_trainer.py:447-448: contrast(f1, f2, y,
                # f2_jig, f1_jig, ...)), so logits1_jig = f2_jig . w2 and
                # logits2_jig = f1_jig . w1 — same-modality jig NCE
                logits.append(memory_logits(out["feat2_jig"],
                                            memory.banks[1], idx,
                                            cfg.nce_t, baseline_dense))
                logits.append(memory_logits(out["feat1_jig"],
                                            memory.banks[0], idx,
                                            cfg.nce_t, baseline_dense))
                names += ["jig2", "jig1"]
            banks = jnp.stack([
                update_memory(memory.banks[0], out["feat1"], y, cfg.nce_m),
                update_memory(memory.banks[1], out["feat2"], y, cfg.nce_m),
            ])
            new_memory = MemoryState(banks=banks)
            losses, accs = compute_loss_accuracy(tuple(logits))
            if "feat1_jig" in out:
                # total = (1-b)*(l12+l21) + b*(ljig2+ljig1)
                # (contrast_trainer.py:452); metrics log the RAW losses
                # like the reference meters do
                loss_weights = [1 - cfg.beta, 1 - cfg.beta,
                                cfg.beta, cfg.beta]
        else:  # RGB (InsDis/PIRL): single bank, RGBMem (mem_bank.py:55-90)
            apply_kw = {}
            if cfg.jigsaw and "rgbd_jig" in batch:
                # PIRL: 9 patches/sample + random permutation per image
                # (JigsawHead.get_shuffle_ids, networks/util.py:115-124)
                bsz = y.shape[0]
                perms = jax.vmap(
                    lambda k: jax.random.permutation(k, 9))(
                    jax.random.split(rngs[2], bsz))
                shuffle_ids = (perms
                               + jnp.arange(bsz)[:, None] * 9).reshape(-1)
                xj = batch["rgbd_jig"]
                apply_kw = {"x_jig": xj.reshape(-1, *xj.shape[2:]),
                            "shuffle_ids": shuffle_ids}
            out, new_bs = _apply(model, params, batch_stats, batch["rgbd"],
                                 train=True, **apply_kw)
            idx = sample_negative_indices(rngs[0], y, memory.n_data,
                                          cfg.nce_k)
            logits = [
                memory_logits(out["feat"], memory.banks[0], idx, cfg.nce_t,
                              baseline_dense),
            ]
            names = ["ins"]
            if "feat_jig" in out:
                logits.append(memory_logits(out["feat_jig"],
                                            memory.banks[0], idx,
                                            cfg.nce_t, baseline_dense))
                names.append("jig")
            new_memory = MemoryState(banks=jnp.stack([
                update_memory(memory.banks[0], out["feat"], y, cfg.nce_m)
            ]))
            losses, accs = compute_loss_accuracy(tuple(logits))
            if "feat_jig" in out:
                # PIRL total = (1-b)*l_ins + b*l_jig
                # (contrast_trainer.py:465-467); metrics log raw losses
                loss_weights = [1 - cfg.beta, cfg.beta]

        loss = (sum(losses) if loss_weights is None else
                sum(w * l for w, l in zip(loss_weights, losses)))
        for n, l, a in zip(names, losses, accs):
            metrics[f"nce_loss_{n}"] = l
            metrics[f"nce_acc_{n}"] = a

        if stage2:
            depth_channel = batch["rgbd"][..., 3]
            sp_losses, sp_accs = soft_pri3d_loss(
                rngs[1], out["linear_merge1"], out["linear_merge2"],
                batch["depth_mask"], cfg.pri3d_num_samples_per_image,
                cfg.temperature, use_depth=use_depth,
                sample_ind=batch.get("pix_idx"))
            j_losses, j_accs = joints_pri3d_loss(
                out["linear_merge1"], out["linear_merge2"], out["fm3"],
                batch["joints2d"], batch["joints_vis"], cfg.temperature,
                use_depth=use_depth)
            ud = use_depth if use_depth is not None else jnp.ones_like(y)
            ur = use_rgb if use_rgb is not None else jnp.ones_like(y)
            scl = _scl_grouped(
                out["linear_merge1"], out["linear_merge2"],
                batch["joints2d"], ud, ur, cfg.temperature, scl_groups)
            # unit-weight sum, matching contrast_trainer.py:980
            loss = loss + sum(sp_losses) + sum(j_losses) + scl
            metrics.update(
                loss_rgb2depth=sp_losses[0], loss_depth2rgb=sp_losses[1],
                acc_rgb2depth=sp_accs[0], acc_depth2rgb=sp_accs[1],
                loss_rgb2joint=j_losses[0], loss_d2joint=j_losses[1],
                acc_rgb2joint=j_accs[0], acc_d2joint=j_accs[1],
                loss_scl=scl)

        metrics["loss"] = loss
        return loss, (new_bs, new_memory, metrics)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch, rng):
        (_, (new_bs, new_memory, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
            state.params, state.batch_stats, state.memory, batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["learning_rate"] = lr_fn(state.step)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            memory=new_memory,
        )
        return new_state, metrics

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step_microbatch(state: TrainState, batch, rng):
        """Scan-microbatched step (cfg.microbatch > 1): n sequential
        microbatches inside one executable, grads accumulated against the
        SAME params, one optimizer update.  Activation residency = one
        microbatch (lax.scan reuses the body's buffers), so effective
        batches past the single-shot HBM limit compile.  BN batch stats
        and the bank EMA chain through microbatches (each sees the
        previous one's update — the per-step semantics a reference run
        with n gradient-accumulation steps would have)."""
        n = cfg.microbatch

        def split(x):
            return x.reshape((n, x.shape[0] // n) + x.shape[1:])

        mbs = jax.tree_util.tree_map(split, batch)
        keys = jax.random.split(rng, n)
        zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)

        def body(carry, xs):
            gacc, bs, mem = carry
            mb, key = xs
            (_, (nbs, nmem, metrics)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, bs, mem, mb, key)
            gacc = jax.tree_util.tree_map(jnp.add, gacc, grads)
            return (gacc, nbs, nmem), metrics

        (gacc, new_bs, new_memory), mmetrics = jax.lax.scan(
            body, (zero, state.batch_stats, state.memory), (mbs, keys))
        grads = jax.tree_util.tree_map(lambda g: g / n, gacc)
        metrics = jax.tree_util.tree_map(lambda m: m.mean(0), mmetrics)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["learning_rate"] = lr_fn(state.step)
        return state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            opt_state=new_opt, memory=new_memory), metrics

    def moco_loss_fn(params, params_ema, batch_stats, moco, batch, rng):
        # two augmented crops stacked on channels: (x[..., :c], x[..., c:])
        # (contrast_trainer.py:288-293)
        x = batch["rgbd"]
        c = x.shape[-1] // 2
        q_in, k_in = x[..., :c], x[..., c:]
        rng, jig_rng = jax.random.split(rng)
        apply_kw = {}
        if cfg.jigsaw and "rgbd_jig" in batch:
            # query pass carries the PIRL patch stack (moco trainer
            # contrast_trainer.py:296-300); key pass runs without it
            bsz = x.shape[0]
            perms = jax.vmap(lambda k: jax.random.permutation(k, 9))(
                jax.random.split(jig_rng, bsz))
            shuffle_ids = (perms + jnp.arange(bsz)[:, None] * 9).reshape(-1)
            xj = batch["rgbd_jig"]
            apply_kw = {"x_jig": xj.reshape(-1, *xj.shape[2:]),
                        "shuffle_ids": shuffle_ids}
        out_q, new_bs = _apply(model, params, batch_stats, q_in, train=True,
                               **apply_kw)
        # key encoder: EMA params, batch permuted (ShuffleBN analog; with
        # global sync-BN this is belt-and-braces).  train=True: the
        # reference sets the EMA model's BN layers to TRAIN mode
        # (set_bn_train, contrast_trainer.py:266-269), so keys are
        # normalized with BATCH statistics, not running averages; the
        # stat mutation is discarded (the reference's EMA-model running
        # stats are never consumed during training either).
        perm = jax.random.permutation(rng, x.shape[0])
        inv = jnp.argsort(perm)
        out_k, _ = _apply(model, params_ema, batch_stats, k_in[perm],
                          train=True)
        if cfg.modal == "CMC":
            # CMCMoCo (mem_moco.py:91-142): cross-modal query-vs-key
            k1 = jax.lax.stop_gradient(out_k["feat1"][inv])
            k2 = jax.lax.stop_gradient(out_k["feat2"][inv])
            lg1 = moco_logits(out_q["feat1"], k2, moco.queues[1], cfg.nce_t)
            lg2 = moco_logits(out_q["feat2"], k1, moco.queues[0], cfg.nce_t)
            l1, a1 = nce_loss_and_acc(lg1)
            l2, a2 = nce_loss_and_acc(lg2)
            loss = l1 + l2
            metrics = {"nce_acc_12": a1, "nce_acc_21": a2}
            if "feat1_jig" in out_q:
                # swapped jig args (contrast_trainer.py:306): same-modality
                # jig NCE, loss = (1-b)(l1+l2) + b*(l1j+l2j) (:308-311)
                l1j, a1j = nce_loss_and_acc(moco_logits(
                    out_q["feat2_jig"], k2, moco.queues[1], cfg.nce_t))
                l2j, a2j = nce_loss_and_acc(moco_logits(
                    out_q["feat1_jig"], k1, moco.queues[0], cfg.nce_t))
                loss = (1 - cfg.beta) * loss + cfg.beta * (l1j + l2j)
                metrics.update(nce_acc_jig2=a1j, nce_acc_jig1=a2j,
                               loss_jig=0.5 * (l1j + l2j))
            new_moco = moco_enqueue(moco, jnp.stack([k1, k2]))
            metrics["loss"] = loss
            return loss, (new_bs, new_moco, metrics)
        k_feat = out_k["feat"][inv]
        logits = moco_logits(out_q["feat"], k_feat, moco.queues[0],
                             cfg.nce_t)
        loss, acc = nce_loss_and_acc(logits)
        metrics = {"nce_acc": acc}
        if "feat_jig" in out_q:
            # RGBMoCo jig logit vs the same key/queue (mem_moco.py:60-88),
            # loss = (1-b)*l + b*l_jig (contrast_trainer.py:320-324)
            lj, aj = nce_loss_and_acc(moco_logits(
                out_q["feat_jig"], k_feat, moco.queues[0], cfg.nce_t))
            loss = (1 - cfg.beta) * loss + cfg.beta * lj
            metrics.update(nce_acc_jig=aj, loss_jig=lj)
        new_moco = moco_enqueue(moco, k_feat[None])
        metrics["loss"] = loss
        return loss, (new_bs, new_moco, metrics)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def moco_train_step(state: TrainState, batch, rng):
        (_, (new_bs, new_moco, metrics)), grads = jax.value_and_grad(
            moco_loss_fn, has_aux=True)(
            state.params, state.params_ema, state.batch_stats, state.moco,
            batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # momentum encoder EMA (momentum_update, contrast_trainer.py:1041-45)
        a = cfg.alpha
        new_ema = jax.tree_util.tree_map(
            lambda e, p: a * e + (1 - a) * p, state.params_ema, new_params)
        metrics["learning_rate"] = lr_fn(state.step)
        return state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            opt_state=new_opt, moco=new_moco, params_ema=new_ema,
        ), metrics

    if is_moco:
        return moco_train_step
    if getattr(cfg, "microbatch", 1) > 1:
        return train_step_microbatch
    return train_step
