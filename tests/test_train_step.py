"""End-to-end train-step tests on the 8-device virtual CPU mesh.

Exercises the full SPMD path: global-view jit, batch sharded over 'data',
replicated params + memory banks, functional bank update — the TPU-native
analogue of the reference's 4-GPU DDP loop (SURVEY.md §4 implication (3))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hcmoco_tpu.core.config import TrainConfig, resolve_config
from hcmoco_tpu.models.build import build_model
from hcmoco_tpu.parallel.mesh import make_mesh, shard_batch, replicated_sharding
from hcmoco_tpu.train.state import create_train_state
from hcmoco_tpu.train.contrast_step import make_contrast_train_step
from hcmoco_tpu.train.schedules import learning_rate_fn
from hcmoco_tpu.data.synthetic import synthetic_contrast_batch

N_DATA = 64


@pytest.fixture(autouse=True)
def _no_persistent_compile_cache():
    """XLA:CPU deadlocks (all-reduce rendezvous never completes -> SIGABRT)
    when this module's MULTI-DEVICE executables are reloaded from the
    persistent compilation cache; fresh compiles are reliable.  See
    CLAUDE.md "second cache trap"."""
    jax.config.update("jax_enable_compilation_cache", False)
    yield
    jax.config.update("jax_enable_compilation_cache", True)


def tiny_cfg(**kw):
    base = dict(
        method="Customize", modal="RGBD2S", arch="HRNet", width=4,
        mem="bank", nce_k=15, nce_t=0.07, batch_size=8, epochs=4,
        learning_rate=0.05, modality_missing=True, compute_dtype="float32",
        linear_feat_map=False,
    )
    base.update(kw)
    return TrainConfig(**base)


def make_batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    return synthetic_contrast_batch(rng, cfg.batch_size, size=32,
                                    num_joints=16, n_data=N_DATA)


def setup(cfg):
    model = build_model(cfg)
    batch = make_batch(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch,
                               n_data=N_DATA, steps_per_epoch=2)
    step = make_contrast_train_step(cfg, model, steps_per_epoch=2)
    return model, batch, state, step


class TestStage1:
    def test_step_runs_and_updates(self):
        cfg = tiny_cfg()
        model, batch, state, step = setup(cfg)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["loss"]))
        # params changed
        p0 = jax.tree_util.tree_leaves(state.params)[0]
        p1 = jax.tree_util.tree_leaves(new_state.params)[0]
        assert not np.allclose(np.asarray(p0), np.asarray(p1))
        # bank rows at batch indices updated, stay unit norm
        norms = np.linalg.norm(np.asarray(new_state.memory.banks), axis=-1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-4)

    def test_loss_decreases_over_steps(self):
        cfg = tiny_cfg()
        model, batch, state, step = setup(cfg)
        losses = []
        for i in range(4):
            state, metrics = step(state, batch, jax.random.PRNGKey(2))
            losses.append(float(metrics["loss"]))
        # same batch + same negatives each step -> should overfit downward
        assert losses[-1] < losses[0]

    def test_microbatch_step(self):
        """Scan-microbatched step (cfg.microbatch=2): same batch produces
        a finite loss, one optimizer update, per-microbatch bank EMA
        chaining (rows stay unit-norm), and its grads are the n-average —
        at identical params the n=2 update equals averaging the two
        single-shot updates' grads, so the loss metrics must equal the
        mean of the two halves' single-shot losses."""
        cfg = tiny_cfg(microbatch=2)
        model, batch, state, step = setup(cfg)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["loss"]))
        norms = np.linalg.norm(np.asarray(new_state.memory.banks), axis=-1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-4)

        # reference: run the two halves single-shot with the carry chain
        base = make_contrast_train_step(tiny_cfg(), model,
                                        steps_per_epoch=2)
        half = {k: v[: cfg.batch_size // 2] for k, v in batch.items()}
        half2 = {k: v[cfg.batch_size // 2:] for k, v in batch.items()}
        keys = jax.random.split(jax.random.PRNGKey(1), 2)
        s1, m1 = base(state, half, keys[0])
        # chain bs/memory but NOT params (grad accumulation semantics)
        s_mid = state.replace(batch_stats=s1.batch_stats,
                              memory=s1.memory)
        s2, m2 = base(s_mid, half2, keys[1])
        np.testing.assert_allclose(
            float(metrics["loss"]),
            (float(m1["loss"]) + float(m2["loss"])) / 2, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(new_state.memory.banks),
                                   np.asarray(s2.memory.banks), atol=1e-5)

    def test_sharded_matches_single_device(self):
        cfg = tiny_cfg()
        model, batch, state, step = setup(cfg)
        mesh = make_mesh()
        sharded = shard_batch(batch, mesh)
        rep = replicated_sharding(mesh)
        state_sh = jax.device_put(state, rep)
        # mesh-aware step: pins the counts sampler replicated (collective-
        # free); the RNG stream is identical so losses remain comparable
        step_m = make_contrast_train_step(cfg, model, steps_per_epoch=2,
                                          mesh=mesh)
        s1, m1 = step(state, batch, jax.random.PRNGKey(3))
        s2, m2 = step_m(state_sh, sharded, jax.random.PRNGKey(3))
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=2e-3)
        b1 = np.asarray(s1.memory.banks)
        b2 = np.asarray(s2.memory.banks)
        np.testing.assert_allclose(b1, b2, rtol=2e-3, atol=1e-5)


class TestStage2:
    def test_full_hcmoco_losses(self):
        cfg = tiny_cfg(mem="bank+jointspri3d", linear_feat_map=True,
                       pri3d_num_samples_per_image=16)
        model, batch, state, step = setup(cfg)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        for k in ("loss_rgb2depth", "loss_depth2rgb", "loss_rgb2joint",
                  "loss_d2joint", "loss_scl"):
            assert k in metrics and np.isfinite(float(metrics[k])), k
        assert np.isfinite(float(metrics["loss"]))

    def test_grads_flow_to_all_encoders(self):
        cfg = tiny_cfg(mem="bank+jointspri3d", linear_feat_map=True,
                       pri3d_num_samples_per_image=16)
        model, batch, state, step = setup(cfg)
        new_state, _ = step(state, batch, jax.random.PRNGKey(1))
        for enc in ("encoder1", "encoder2", "encoder3",
                    "encoder1_linear", "encoder2_linear"):
            before = jax.tree_util.tree_leaves(state.params[enc])
            after = jax.tree_util.tree_leaves(new_state.params[enc])
            changed = any(
                not np.allclose(np.asarray(b), np.asarray(a))
                for b, a in zip(before, after))
            assert changed, f"{enc} got no gradient"


class TestSchedule:
    def test_cosine_matches_reference_formula(self):
        cfg = resolve_config(TrainConfig(
            learning_rate=0.03, cosine=True, epochs=100, batch_size=224,
            lr_decay_rate=0.1))
        fn = learning_rate_fn(cfg, steps_per_epoch=10)
        import math
        lr0, dr = 0.03, 0.1
        eta = lr0 * dr ** 3
        # epoch 50 (steps 490-499)
        expect = eta + (lr0 - eta) * (1 + math.cos(math.pi * 50 / 100)) / 2
        np.testing.assert_allclose(float(fn(495)), expect, rtol=1e-6)

    def test_step_decay(self):
        cfg = TrainConfig(learning_rate=0.1, cosine=False,
                          lr_decay_epochs=(3, 5), lr_decay_rate=0.1,
                          epochs=10, batch_size=8, warm=False)
        fn = learning_rate_fn(cfg, steps_per_epoch=2)
        assert abs(float(fn(0)) - 0.1) < 1e-7  # epoch 1
        assert abs(float(fn(7)) - 0.01) < 1e-7  # epoch 4 > 3
        assert abs(float(fn(9)) - 0.01) < 1e-7  # epoch 5 not > 5
        assert abs(float(fn(11)) - 0.001) < 1e-7  # epoch 6

    def test_warmup_ramp(self):
        cfg = TrainConfig(learning_rate=0.03, cosine=True, epochs=100,
                          warm=True, batch_size=8)
        fn = learning_rate_fn(cfg, steps_per_epoch=4)
        assert float(fn(0)) == pytest.approx(0.01, rel=1e-5)
        assert float(fn(10)) > float(fn(0))


class TestMoCo:
    def test_moco_step(self):
        cfg = tiny_cfg(modal="RGB", arch="resnet18", mem="moco", nce_k=32,
                       modality_missing=False)
        model = build_model(cfg)
        rng = np.random.default_rng(0)
        batch = {
            "rgbd": rng.standard_normal((4, 32, 32, 6)).astype(np.float32),
            "index": np.arange(4, dtype=np.int32),
        }
        # model consumes 3 channels; batch carries two 3ch crops
        state = create_train_state(
            cfg, model, jax.random.PRNGKey(0),
            {"rgbd": batch["rgbd"][..., :3]}, n_data=N_DATA,
            steps_per_epoch=2)
        step = make_contrast_train_step(cfg, model, steps_per_epoch=2)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.moco.ptr) == 4
        # EMA params moved toward new params
        e0 = jax.tree_util.tree_leaves(state.params_ema)[0]
        e1 = jax.tree_util.tree_leaves(new_state.params_ema)[0]
        assert not np.allclose(np.asarray(e0), np.asarray(e1))

    def test_moco_keys_invariant_to_shard_layout(self):
        """The ShuffleBN invariant (contrast_trainer.py:167-210): key
        features must not depend on how the batch is laid out across
        devices.  The reference enforces this by shuffling samples across
        GPUs before the per-GPU-BN key pass; our redesign gets it from
        global sync-BN + an in-step permutation.  Verified by running the
        SAME moco step single-device and sharded over the 8-device mesh:
        queues (the enqueued keys) and updated params must agree."""
        cfg = tiny_cfg(modal="CMC", arch="resnet18", mem="moco", nce_k=32,
                       modality_missing=False, batch_size=8)
        model = build_model(cfg)
        rng = np.random.default_rng(0)
        batch = {
            # two 6-channel crops (CMC split (3,3) per crop) = 12 channels
            "rgbd": rng.standard_normal((8, 32, 32, 12)).astype(np.float32),
            "index": np.arange(8, dtype=np.int32),
        }
        state = create_train_state(
            cfg, model, jax.random.PRNGKey(0),
            {"rgbd": batch["rgbd"][..., :6]}, n_data=N_DATA,
            steps_per_epoch=2)
        step = make_contrast_train_step(cfg, model, steps_per_epoch=2)

        s1, m1 = step(state, batch, jax.random.PRNGKey(7))

        mesh = make_mesh()
        sharded = shard_batch(batch, mesh)
        state_sh = jax.device_put(state, replicated_sharding(mesh))
        s2, m2 = step(state_sh, sharded, jax.random.PRNGKey(7))

        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-5)
        # the enqueued keys ARE the ShuffleBN invariant: bit-identical
        np.testing.assert_allclose(np.asarray(s1.moco.queues),
                                   np.asarray(s2.moco.queues),
                                   rtol=0, atol=1e-6)
        # params after one SGD step only match loosely: the 8-way psum
        # reorders fp32 summation and backward roundoff amplifies through
        # depth (measured: torch fp32 is ~8e-3 off its own fp64 grads at
        # the stem — tools/ref_parity.py)
        p1 = jax.tree_util.tree_leaves(s1.params)
        p2 = jax.tree_util.tree_leaves(s2.params)
        for a, b in zip(p1, p2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-2, atol=5e-2)


class TestSCLGrouping:
    """VERDICT round-2 weak #4: the reference computes cross-subject SCL on
    each GPU's LOCAL batch (contrast_trainer.py:830-892).  cfg.scl_groups=0
    (default) must derive one group per data-mesh shard in BOTH the CLI
    step (mesh passed) and dryrun_multichip, and grouped SCL must actually
    differ from global-batch SCL (so the pin is meaningful)."""

    def _stage2_cfg(self):
        return tiny_cfg(mem="bank+jointspri3d", linear_feat_map=True,
                        pri3d_num_samples_per_image=8)

    def test_grouped_differs_from_global(self):
        from hcmoco_tpu.train.contrast_step import _scl_grouped

        rng = np.random.default_rng(3)
        b, h, w, c, j = 8, 8, 8, 16, 16
        lm1 = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
        lm2 = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
        j2d = jnp.asarray(rng.uniform(0, 4 * h, (b, j, 2)), jnp.float32)
        ones = jnp.ones((b,), jnp.int32)
        g1 = float(_scl_grouped(lm1, lm2, j2d, ones, ones, 0.07, 1))
        g4 = float(_scl_grouped(lm1, lm2, j2d, ones, ones, 0.07, 4))
        assert np.isfinite(g1) and np.isfinite(g4)
        assert abs(g1 - g4) > 1e-4, (g1, g4)

    def test_auto_matches_explicit_mesh_groups(self):
        cfg = self._stage2_cfg()
        assert cfg.scl_groups == 0  # auto is the default
        model, batch, state, _ = setup(cfg)
        mesh = make_mesh()
        sharded = shard_batch(batch, mesh)
        rep = replicated_sharding(mesh)

        auto = make_contrast_train_step(cfg, model, steps_per_epoch=2,
                                        mesh=mesh)
        explicit = make_contrast_train_step(cfg, model, steps_per_epoch=2,
                                            scl_groups=8, mesh=mesh)
        glob = make_contrast_train_step(cfg, model, steps_per_epoch=2,
                                        scl_groups=1, mesh=mesh)
        k = jax.random.PRNGKey(5)
        _, m_auto = auto(jax.device_put(state, rep), sharded, k)
        _, m_exp = explicit(jax.device_put(state, rep), sharded, k)
        _, m_glob = glob(jax.device_put(state, rep), sharded, k)
        np.testing.assert_allclose(float(m_auto["loss_scl"]),
                                   float(m_exp["loss_scl"]), rtol=1e-6)
        assert abs(float(m_auto["loss_scl"])
                   - float(m_glob["loss_scl"])) > 1e-5


class TestBankCollisions:
    def test_update_memory_last_write_wins_sharded(self):
        """SURVEY §7 hard-part 3: duplicate sample indices across shards
        must resolve exactly like torch index_copy_ (mem_bank.py:15-28) —
        the LAST occurrence in batch order wins — bit-identically on the
        8-device mesh."""
        from hcmoco_tpu.contrast.memory import update_memory

        dim, n_data = 16, 32
        rng = np.random.default_rng(5)
        bank = rng.standard_normal((n_data, dim)).astype(np.float32)
        bank /= np.linalg.norm(bank, axis=-1, keepdims=True)
        x = rng.standard_normal((8, dim)).astype(np.float32)
        # duplicates within shards and across shard boundaries
        y = np.array([3, 3, 5, 5, 5, 2, 2, 0], np.int32)

        mesh = make_mesh()
        bank_d = jax.device_put(jnp.asarray(bank),
                                replicated_sharding(mesh))
        from jax.sharding import NamedSharding, PartitionSpec as P
        x_d = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
        y_d = jax.device_put(jnp.asarray(y), NamedSharding(mesh, P("data")))

        out = jax.jit(update_memory, static_argnames="m")(
            bank_d, x_d, y_d, m=0.5)

        # numpy reference: sequential last-write-wins
        expect = bank.copy().astype(np.float64)
        for i in range(8):
            w = 0.5 * bank[y[i]].astype(np.float64) + 0.5 * x[i]
            expect[y[i]] = w / max(np.sqrt((w ** 2).sum()), 1e-12)
        got = np.asarray(out)
        np.testing.assert_allclose(got, expect.astype(np.float32),
                                   rtol=1e-5, atol=1e-6)
        # rows written exactly once per final occurrence; untouched rows
        # bit-identical
        untouched = np.setdiff1d(np.arange(n_data), y)
        np.testing.assert_array_equal(got[untouched], bank[untouched])

    def test_stage1_step_with_cross_shard_collisions(self):
        """Full sharded stage-1 step where the batch's sample indices
        collide across shards: banks must match the single-device step."""
        cfg = tiny_cfg(batch_size=8)
        model, batch, state, step = setup(cfg)
        batch = dict(batch)
        batch["index"] = np.array([7, 7, 7, 1, 1, 9, 9, 9], np.int32)

        s1, m1 = step(state, batch, jax.random.PRNGKey(11))
        mesh = make_mesh()
        sharded = shard_batch(batch, mesh)
        state_sh = jax.device_put(state, replicated_sharding(mesh))
        step_m = make_contrast_train_step(cfg, model, steps_per_epoch=2,
                                          mesh=mesh)
        s2, m2 = step_m(state_sh, sharded, jax.random.PRNGKey(11))

        b1 = np.asarray(s1.memory.banks)
        b2 = np.asarray(s2.memory.banks)
        np.testing.assert_allclose(b1, b2, rtol=2e-3, atol=1e-5)
        # collided rows ended unit-norm (i.e. a single coherent winner, not
        # a mixed/raced write)
        norms = np.linalg.norm(b2, axis=-1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-4)
