"""PointNet++ MSG encoder + HRNetPN tri-modal model tests (tiny scales)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hcmoco_tpu.core.config import TrainConfig
from hcmoco_tpu.models.pointnet2_model import (
    Pointnet2MSG, HCMoCoPNModel, depth2pts, pts2depth,
)
from hcmoco_tpu.models.build import build_model
from hcmoco_tpu.data.synthetic import synthetic_contrast_batch
from hcmoco_tpu.train.state import create_train_state
from hcmoco_tpu.train.contrast_step import make_contrast_train_step

# The PN path must stay RuntimeWarning-clean (VERDICT r3: the three_nn pad
# sentinel's overflow cast polluted the multichip certification artifact).
pytestmark = pytest.mark.filterwarnings("error::RuntimeWarning")


class TestPointnet2MSG:
    def test_forward_shape(self):
        model = Pointnet2MSG(npoints=(32, 8, 2, 1))
        pc = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 3))
        v = model.init(jax.random.PRNGKey(1), pc, train=False)
        out = model.apply(v, pc, train=False)
        assert out.shape == (2, 32, 128)

    def test_msg_channel_widths(self):
        # SA level k output = sum of scale-mlp tails (pointnet2_msg MLPS)
        model = Pointnet2MSG(npoints=(16, 8, 4, 2))
        pc = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 3))
        v = model.init(jax.random.PRNGKey(1), pc, train=False)
        # just confirm init works and params exist for all 4 SA + 4 FP
        names = set(v["params"].keys())
        assert {f"sa{k}" for k in range(4)} <= names
        assert {f"fp{k}" for k in range(4)} <= names


class TestProjectThenGroup:
    def test_project_then_group_equivalence(self):
        """SharedMLP's project-then-group rewrite (layer-0 Dense commutes
        with the neighbor gather) must equal the naive group-then-project
        path: W^T concat(xyz[k]-c, f[k]) == (table@W)[k] - concat(c,0)@W."""
        from hcmoco_tpu.models.pointnet2_model import SharedMLP
        from hcmoco_tpu.ops.point_ops import ball_query, query_and_group

        rng = np.random.default_rng(3)
        xyz = jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32)
        feats = jnp.asarray(rng.standard_normal((2, 64, 10)), jnp.float32)
        new_xyz = xyz[:, :16]
        mlp = SharedMLP((8, 12))
        gidx = ball_query(xyz, new_xyz, 0.8, 4)
        table = jnp.concatenate([xyz, feats], axis=-1)
        v = mlp.init(jax.random.PRNGKey(0), table, train=False,
                     gidx=gidx, center=new_xyz)

        fast, _ = mlp.apply(v, table, train=True, gidx=gidx,
                            center=new_xyz, mutable=["batch_stats"])
        grouped = query_and_group(xyz, new_xyz, feats, 0.8, 4)
        naive, _ = mlp.apply(v, grouped, train=True,
                             mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(fast), np.asarray(naive),
                                   rtol=1e-4, atol=1e-5)


class TestWindowedGroupingIntegration:
    def test_sa_module_windowed_matches_xla(self, monkeypatch):
        """SAModuleMSG with the windowed grouping kernel (interpret mode)
        must match the XLA-gather path on locality-friendly sorted points
        (and the constructed indices must actually be in-window, so the
        fast path — not the fallback — is what's being compared)."""
        from hcmoco_tpu.models.pointnet2_model import SAModuleMSG

        rng = np.random.default_rng(7)
        n = 256
        t = np.linspace(0.0, 10.0, n, dtype=np.float32)
        xyz = np.stack([t, np.sin(t),
                        rng.standard_normal(n).astype(np.float32) * 0.05],
                       axis=-1)[None].repeat(2, 0)
        xyz = jnp.asarray(xyz)
        feats = jnp.asarray(
            rng.standard_normal((2, n, 6)).astype(np.float32))

        sa = SAModuleMSG(npoint=n, radii=(0.4, 0.8), nsamples=(4, 8),
                         mlps=((8, 16), (8, 16)), windows=(24, 48))
        v = sa.init(jax.random.PRNGKey(0), xyz, feats, train=False)

        # sanity: indices really are within the configured windows
        from hcmoco_tpu.ops.point_ops import ball_query
        for r, w in ((0.4, 24), (0.8, 48)):
            g = np.asarray(ball_query(xyz, xyz, r, 8))
            rel = np.abs(g - np.arange(n)[None, :, None])
            assert rel.max() < w, (r, rel.max())

        monkeypatch.setenv("HCMOCO_PN_FORCE_WG", "1")
        (_, out_fast), _ = sa.apply(v, xyz, feats, train=True,
                                    mutable=["batch_stats"])
        monkeypatch.delenv("HCMOCO_PN_FORCE_WG")
        monkeypatch.setenv("HCMOCO_PN_NO_WG", "1")
        (_, out_xla), _ = sa.apply(v, xyz, feats, train=True,
                                   mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_xla),
                                   rtol=1e-5, atol=1e-5)


class TestDepthBackprojection:
    def test_depth2pts_world_coords(self):
        b, s = 2, 8
        depth = jnp.ones((b, s, s))
        mask = jnp.ones((b, s, s))
        gy, gx = np.meshgrid(np.arange(s), np.arange(s), indexing="xy")
        grid = jnp.asarray(
            np.broadcast_to(np.stack([gx, gy], -1), (b, s, s, 2))
        ).astype(jnp.float32)
        mean = jnp.full((b,), 2.0)
        sampled, pts, ind, _ = depth2pts(depth, mask, grid, 424.0, 512.0,
                                      mean, jax.random.PRNGKey(0), 16)
        assert sampled.shape == (b, 16, 3)
        assert pts.shape == (b, s * s, 3)
        # worldX = (gx - 212) * (1+2) * 0.0035 at pixel (0,0)
        np.testing.assert_allclose(float(pts[0, 0, 0]),
                                   (0 - 212.0) * 3.0 * 0.0035, rtol=1e-5)
        np.testing.assert_allclose(float(pts[0, 0, 2]), 1.0, rtol=1e-6)

    def test_no_valid_depth_gives_zero_points(self):
        b, s = 2, 8
        depth = jnp.ones((b, s, s))
        mask = jnp.zeros((b, s, s))
        grid = jnp.zeros((b, s, s, 2))
        sampled, pts, _, _ = depth2pts(depth, mask, grid, 424.0, 512.0,
                                    jnp.ones((b,)), jax.random.PRNGKey(0), 8)
        np.testing.assert_allclose(np.asarray(sampled), 0.0)

    def test_blocked_searchsorted_bit_identical(self):
        """_blocked_searchsorted must equal jnp.searchsorted(side='right')
        for EVERY u, including exact-tie values and u beyond the last cdf
        entry (it replaces the flat 17-iteration binary search that was
        the #1 single op of the round-4 HRNetPN profile)."""
        from hcmoco_tpu.models.pointnet2_model import _blocked_searchsorted

        rng = np.random.default_rng(0)
        b, n, q = 3, 1024, 257
        mask = (rng.random((b, n)) < 0.3).astype(np.float32)
        mask[1] = 0.0  # zero-cloud row: cdf all zeros
        cdf = jnp.cumsum(jnp.asarray(mask), axis=-1)
        total = np.asarray(cdf[:, -1])
        u = rng.random((b, q)).astype(np.float32) * \
            np.maximum(total, 1.0)[:, None]
        # adversarial values: exact integer ties, 0, the total itself
        u[:, 0] = 0.0
        u[:, 1] = 1.0
        u[:, 2] = np.maximum(total - 1.0, 0.0)
        u[:, 3] = total
        u = jnp.sort(jnp.asarray(u), axis=-1)
        ref = jax.vmap(
            lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
        for block in (128, 64):
            got = _blocked_searchsorted(cdf, u, block=block)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        # untileable width falls back to the flat path
        got = _blocked_searchsorted(cdf[:, :1000], u, block=128)
        ref2 = jax.vmap(lambda c, uu: jnp.searchsorted(
            c, uu, side="right"))(cdf[:, :1000], u)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref2))

    def test_depth2pts_blocked_vs_flat_sampler(self, monkeypatch):
        """depth2pts must produce identical samples with the blocked and
        flat searchsorted paths."""
        b, s = 2, 16
        rng = np.random.default_rng(1)
        depth = jnp.asarray(rng.random((b, s, s)).astype(np.float32))
        mask = jnp.asarray((rng.random((b, s, s)) < 0.5)
                           .astype(np.float32))
        grid = jnp.zeros((b, s, s, 2))
        outs = []
        for flag in ("1", "0"):
            monkeypatch.setenv("HCMOCO_SS_BLOCKED", flag)
            outs.append(depth2pts(depth, mask, grid, 424.0, 512.0,
                                  jnp.ones((b,)), jax.random.PRNGKey(0),
                                  32))
        np.testing.assert_array_equal(np.asarray(outs[0][2]),
                                      np.asarray(outs[1][2]))
        np.testing.assert_array_equal(np.asarray(outs[0][0]),
                                      np.asarray(outs[1][0]))

    def test_pts2depth_roundtrip(self):
        # features at the points themselves interpolate back ~exactly
        b, n, c = 1, 16, 4
        pts = jax.random.normal(jax.random.PRNGKey(0), (b, n, 3))
        feats = jax.random.normal(jax.random.PRNGKey(1), (b, n, c))
        out = pts2depth(pts, pts, feats, 4, 4)
        assert out.shape == (b, 4, 4, c)
        np.testing.assert_allclose(np.asarray(out.reshape(b, n, c)),
                                   np.asarray(feats), rtol=1e-3, atol=1e-4)


class TestHRNetPNTrainStep:
    @pytest.mark.slow
    def test_sharded_matches_single_device(self):
        """VERDICT round-2 item 5: the PN stage-2 step on the 8-device CPU
        mesh (XLA point-op fallbacks) must equal the single-device step —
        same loss, same banks.  Covers the §2.9 collectives under the
        second flagship (reference build_backbone.py:305-514)."""
        from hcmoco_tpu.parallel.mesh import (
            make_mesh, shard_batch, replicated_sharding)

        jax.config.update("jax_enable_compilation_cache", False)
        try:
            cfg = TrainConfig(
                modal="RGBD2S", arch="HRNetPN", width=4,
                mem="bank+jointspri3d", linear_feat_map=True,
                pri3d_num_samples_per_image=8, nce_k=15, batch_size=8,
                epochs=2, modality_missing=True, compute_dtype="float32",
                pn_num_points=32,
            )
            model = build_model(cfg)
            batch = synthetic_contrast_batch(
                np.random.default_rng(0), 8, size=32, num_joints=16,
                n_data=64)
            state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                       batch, n_data=64, steps_per_epoch=2)
            step = make_contrast_train_step(cfg, model, steps_per_epoch=2)
            s1, m1 = step(state, batch, jax.random.PRNGKey(3))

            mesh = make_mesh()
            sharded = shard_batch(batch, mesh)
            state_sh = jax.device_put(state, replicated_sharding(mesh))
            step_m = make_contrast_train_step(cfg, model, steps_per_epoch=2,
                                              scl_groups=1, mesh=mesh)
            s2, m2 = step_m(state_sh, sharded, jax.random.PRNGKey(3))
            np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                       rtol=2e-3)
            # atol covers fp32 reduction-order noise through the deeper
            # PN stack (FP interpolation + remat recompute): measured max
            # 1.8e-3 absolute on unit-norm bank rows
            np.testing.assert_allclose(np.asarray(s1.memory.banks),
                                       np.asarray(s2.memory.banks),
                                       rtol=2e-2, atol=2e-3)
        finally:
            jax.config.update("jax_enable_compilation_cache", True)

    def test_full_stage2_step(self):
        cfg = TrainConfig(
            modal="RGBD2S", arch="HRNetPN", width=4,
            mem="bank+jointspri3d", linear_feat_map=True,
            pri3d_num_samples_per_image=8, nce_k=15, batch_size=4,
            epochs=2, modality_missing=True, compute_dtype="float32",
            pn_num_points=32,
        )
        model = build_model(cfg)
        batch = synthetic_contrast_batch(
            np.random.default_rng(0), 4, size=32, num_joints=16, n_data=64)
        state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                   batch, n_data=64, steps_per_epoch=2)
        step = make_contrast_train_step(cfg, model, steps_per_epoch=2)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        for enc in ("encoder1", "encoder2", "encoder3"):
            b0 = jax.tree_util.tree_leaves(state.params[enc])
            b1 = jax.tree_util.tree_leaves(new_state.params[enc])
            assert any(not np.allclose(np.asarray(x), np.asarray(y))
                       for x, y in zip(b0, b1)), enc
