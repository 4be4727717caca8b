"""Model golden-parity tests.

Golden numbers were extracted once from the reference torch implementation
(`/root/reference/pycontrast/networks/`) on CPU:
  - HRNet-W18 backbone: 9,562,260 params; 64x64 input ->
    [(18,16,16),(36,8,8),(72,4,4),(144,2,2)] (NCHW)
  - SemGCN(mpii, hid=128, layers=4): 299,468 params; (B,16,2)->(B,16,128)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcmoco_tpu.core.config import HRNET_W18, TrainConfig, resolve_config
from hcmoco_tpu.models.hrnet import HRNet, merge_all_res
from hcmoco_tpu.models.sgcn import (GraphNonLocal, SemGCN, group_orders,
                                    skeleton_adjacency)
from hcmoco_tpu.models.build import HCMoCoModel, build_model
from hcmoco_tpu.models.heads import l2_normalize, gaussian_blur_nhwc


def n_params(tree):
    return sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(tree))


class TestHRNet:
    def test_param_count_matches_reference(self):
        model = HRNet(HRNET_W18, dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), train=False)
        assert n_params(variables["params"]) == 9_562_260

    def test_output_shapes(self):
        model = HRNet(HRNET_W18, dtype=jnp.float32)
        x = jnp.zeros((2, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        outs = model.apply(variables, x, train=False,
                           mutable=False)
        shapes = [o.shape for o in outs]
        assert shapes == [(2, 16, 16, 18), (2, 8, 8, 36),
                          (2, 4, 4, 72), (2, 2, 2, 144)]

    def test_merge_all_res(self):
        feats = [jnp.zeros((2, 16, 16, 18)), jnp.zeros((2, 8, 8, 36)),
                 jnp.zeros((2, 4, 4, 72)), jnp.zeros((2, 2, 2, 144))]
        merged = merge_all_res(feats)
        assert merged.shape == (2, 16, 16, 270)


class TestSemGCN:
    def test_param_count_matches_reference(self):
        model = SemGCN(128, 4, "mpii")
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 16, 2)), train=False)
        assert n_params(variables["params"]) == 299_468

    def test_output_shape(self):
        model = SemGCN(128, 4, "mpii")
        x = jnp.ones((2, 16, 2))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (2, 16, 128)

    def test_coco_reduce_joints(self):
        model = SemGCN(64, 2, "coco_reduce")
        x = jnp.ones((2, 13, 2))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        assert model.apply(variables, x, train=False).shape == (2, 13, 64)

    def test_adjacency_row_normalized(self):
        a = skeleton_adjacency("mpii")
        assert a.shape == (16, 16)
        np.testing.assert_allclose(a.sum(1), 1.0, rtol=1e-5)
        # symmetric support
        assert ((a > 0) == (a > 0).T).all()


class TestGraphNonLocal:
    """Port of the reference's shipped-but-unused non-local block
    (graph_non_local.py:7-113, reachable via SemGCN(nodes_group=...))."""

    def test_identity_at_init(self):
        # W's BN weight is zero-initialized (graph_non_local.py:66-68), so
        # the block is the identity at init — the standard non-local trick
        x = jax.random.normal(jax.random.PRNGKey(0), (3, 16, 32))
        model = GraphNonLocal(sub_sample=2)
        variables = model.init(jax.random.PRNGKey(1), x, train=False)
        out = model.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_factorized_pairwise_matches_explicit_concat(self):
        """f[b,i,k] = relu(concat(theta_i, phi_k) @ w) — the reference
        materializes the (B, 2ic, N, N') concat (graph_non_local.py:85-101);
        we factorize it into a broadcast add.  Same params => same f."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
        model = GraphNonLocal(bn_layer=False)
        variables = model.init(jax.random.PRNGKey(2), x, train=False)
        # W is zero-init (identity at init); randomize it so the pairwise
        # path actually reaches the output
        variables["params"]["W"]["kernel"] = jnp.asarray(
            rng.standard_normal((8, 16)), jnp.float32)
        p = variables["params"]
        ic = 8
        theta = np.asarray(x @ p["theta"]["kernel"] + p["theta"]["bias"])
        phi = np.asarray(x @ p["phi"]["kernel"] + p["phi"]["bias"])
        g = np.asarray(x @ p["g"]["kernel"] + p["g"]["bias"])
        w = np.asarray(p["concat_project"])
        # explicit reference-shaped pairwise map
        f = np.zeros((2, 8, 8), np.float32)
        for i in range(8):
            for k in range(8):
                cat = np.concatenate([theta[:, i], phi[:, k]], -1)
                f[:, i, k] = np.maximum(cat @ w, 0.0)[:, 0]
        y = (f / 8.0) @ g
        expect = np.asarray(x) + y @ np.asarray(p["W"]["kernel"]) \
            + np.asarray(p["W"]["bias"])
        out = model.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)

    def test_group_orders_inverse(self):
        grouped, restored = group_orders(((2, 3), (0, 1), (5, 4)))
        assert grouped == [2, 3, 0, 1, 5, 4]
        assert [grouped[r] for r in restored] == list(range(6))

    def test_semgcn_nodes_group_forward(self):
        # an even 2-partition of the 16 MPII joints exercises the grouped
        # non-local interleaving (sem_gcn.py:68-87)
        groups = tuple((i, i + 1) for i in range(0, 16, 2))
        model = SemGCN(32, 2, "mpii", nodes_group=groups)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 2))
        variables = model.init(jax.random.PRNGKey(1), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (2, 16, 32)
        # non-local blocks appear after the input block and every res block
        names = set(variables["params"].keys())
        assert {"nl_input", "nl0", "nl1"} <= names
        # at init the non-local blocks are identities -> equals the
        # nodes_group=None model with the shared params transplanted
        base = SemGCN(32, 2, "mpii")
        shared = {
            col: {k: v for k, v in variables[col].items()
                  if not k.startswith("nl")}
            for col in ("params", "batch_stats")
        }
        bout = base.apply(shared, x, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(bout),
                                   atol=1e-5)


class TestHCMoCoModel:
    def test_forward_shapes(self):
        model = HCMoCoModel(width=18, linear_feat_map=True,
                            dtype=jnp.float32)
        rgbd = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 6))
        skel = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 2))
        variables = model.init(jax.random.PRNGKey(0), rgbd, skel,
                               train=False, return_fm=True)
        out = model.apply(variables, rgbd, skel, train=False, return_fm=True)
        assert out["feat1"].shape == (2, 128)
        assert out["feat2"].shape == (2, 128)
        assert out["feat3"].shape == (2, 128)
        assert out["pooled1"].shape == (2, 270)
        assert out["linear_merge1"].shape == (2, 16, 16, 128)
        assert out["linear_merge2"].shape == (2, 16, 16, 128)
        # projections live on the unit sphere
        np.testing.assert_allclose(
            np.linalg.norm(out["feat1"], axis=-1), 1.0, rtol=1e-4)

    def test_build_model_registry(self):
        cfg = resolve_config(TrainConfig(method="CMCRGBD2S", arch="HRNet",
                                         in_channel_list=(3, 3)))
        model = build_model(cfg)
        assert isinstance(model, HCMoCoModel)

    def test_paired_encoders_match_unpaired(self):
        """pair_encoders=True (vmapped grouped-conv encoders, the TPU perf
        layout) is the same math: transplanting encoder1/encoder2 params
        into the stacked [2] layout reproduces the unpaired outputs."""
        from hcmoco_tpu.models.build import (pair_encoder_params,
                                             unpair_encoder_params)

        rgbd = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 6))
        skel = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 2))
        base = HCMoCoModel(width=18, linear_feat_map=True,
                           dtype=jnp.float32)
        v = base.init(jax.random.PRNGKey(0), rgbd, skel, train=False,
                      return_fm=True)
        paired_model = HCMoCoModel(width=18, linear_feat_map=True,
                                   pair_encoders=True, dtype=jnp.float32)
        pv = {
            "params": dict(v["params"]),
            "batch_stats": dict(v["batch_stats"]),
        }
        for col in ("params", "batch_stats"):
            e1 = pv[col].pop("encoder1")
            e2 = pv[col].pop("encoder2")
            pv[col]["encoder_pair"] = pair_encoder_params(e1, e2)
        out = base.apply(v, rgbd, skel, train=False, return_fm=True)
        pout = paired_model.apply(pv, rgbd, skel, train=False,
                                  return_fm=True)
        for k in ("feat1", "feat2", "pooled1", "pooled2",
                  "linear_merge1", "linear_merge2"):
            # grouped-vs-separate conv accumulation order drifts over ~30
            # layers; 5e-4 relative is far below any training-relevant scale
            np.testing.assert_allclose(np.asarray(pout[k]),
                                       np.asarray(out[k]),
                                       rtol=5e-4, atol=1e-3, err_msg=k)
        # round-trip of the pairing utilities
        b1, b2 = unpair_encoder_params(pv["params"]["encoder_pair"])
        for a, b in zip(jax.tree_util.tree_leaves(b1),
                        jax.tree_util.tree_leaves(v["params"]["encoder1"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bn_stats_update_in_train_mode(self):
        model = HCMoCoModel(width=18, dtype=jnp.float32)
        rgbd = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 6))
        skel = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 2))
        variables = model.init(jax.random.PRNGKey(0), rgbd, skel, train=False)
        _, mutated = model.apply(variables, rgbd, skel, train=True,
                                 mutable=["batch_stats"])
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(not np.allclose(b, a) for b, a in zip(before, after))


class TestMatmulBN:
    """MatmulBN (MXU-matvec batch stats, PERF.md MFU experiment) must be a
    drop-in for nn.BatchNorm: same variable names, same math to rounding."""

    def _both(self, train, custom_vjp=False):
        from flax import linen as nn
        from hcmoco_tpu.models.hrnet import MatmulBN

        x = jax.random.normal(jax.random.PRNGKey(3), (4, 8, 8, 18),
                              jnp.float32) * 2.0 + 0.5
        ref = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                           epsilon=1e-5, dtype=jnp.float32)
        mm = MatmulBN(momentum=0.99, epsilon=1e-5, custom_vjp=custom_vjp,
                      dtype=jnp.float32)
        v_ref = ref.init(jax.random.PRNGKey(0), x)
        v_mm = mm.init(jax.random.PRNGKey(0), x,
                       use_running_average=not train)
        assert (jax.tree_util.tree_structure(v_ref)
                == jax.tree_util.tree_structure(v_mm))
        # non-trivial scale/bias/running stats so eval mode is exercised too
        rng = np.random.default_rng(0)
        v = jax.tree_util.tree_map(
            lambda p: jnp.asarray(
                rng.uniform(0.5, 1.5, p.shape).astype(np.float32)), v_ref)
        y_ref, m_ref = ref.apply(v, x, mutable=["batch_stats"])
        y_mm, m_mm = mm.apply(v, x, use_running_average=not train,
                              mutable=["batch_stats"])
        return (x, v, ref, mm), (y_ref, m_ref), (y_mm, m_mm)

    @pytest.mark.parametrize("custom_vjp", [False, True])
    def test_train_mode_matches_flax(self, custom_vjp):
        _, (y_ref, m_ref), (y_mm, m_mm) = self._both(train=True,
                                                     custom_vjp=custom_vjp)
        np.testing.assert_allclose(y_mm, y_ref, rtol=2e-5, atol=2e-5)
        for a, b in zip(jax.tree_util.tree_leaves(m_ref),
                        jax.tree_util.tree_leaves(m_mm)):
            np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-6)

    def test_eval_mode_matches_flax(self):
        _, (y_ref, _), (y_mm, _) = self._both(train=False)
        np.testing.assert_allclose(y_mm, y_ref, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("mode", ["1", "2"])
    def test_hrnet_end_to_end_matches_reduce_bn(self, mode, monkeypatch):
        """The HCMOCO_BN_MATMUL knob must not change HRNet math: same
        params tree, same forward, same grads (to f32 rounding)."""
        from hcmoco_tpu.core.config import HRNET_TINY

        # 64px (not 32): at 32px the branch3 BN stats cover only 2x2xB=8
        # rows and their conditioning amplifies stat rounding into ~6%
        # grad divergence in that subtree alone (measured; forward agrees
        # to 4e-6 either way)
        x = jax.random.normal(jax.random.PRNGKey(7), (2, 64, 64, 3))

        def run():
            model = HRNet(HRNET_TINY, dtype=jnp.float32)
            v = model.init(jax.random.PRNGKey(0), x, train=False)

            def loss(params, xx):
                outs, _ = model.apply(
                    {"params": params, "batch_stats": v["batch_stats"]},
                    xx, train=True, mutable=["batch_stats"])
                return sum(jnp.sum(o * o) for o in outs)

            l, g = jax.value_and_grad(loss)(v["params"], x)
            return v, l, g

        monkeypatch.delenv("HCMOCO_BN_MATMUL", raising=False)
        v0, l0, g0 = run()
        monkeypatch.setenv("HCMOCO_BN_MATMUL", mode)
        v1, l1, g1 = run()
        assert (jax.tree_util.tree_structure(v0)
                == jax.tree_util.tree_structure(v1))
        np.testing.assert_allclose(l1, l0, rtol=1e-4)
        # elementwise comparison is meaningless here: stat rounding (~1e-7)
        # amplifies through ~30 stacked BN jacobians into near-cancelling
        # entries of the early-layer grads (observed: bulk agrees to 0.3%,
        # a few tiny entries flip).  Per-leaf relative L2 error is the
        # right metric for "same gradient direction/magnitude".
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            a = np.asarray(a, np.float64).ravel()
            b = np.asarray(b, np.float64).ravel()
            denom = np.linalg.norm(a) + 1e-12
            assert np.linalg.norm(b - a) / denom < 2e-2

    @pytest.mark.parametrize("custom_vjp", [False, True])
    def test_grads_match_flax(self, custom_vjp):
        from flax import linen as nn
        from hcmoco_tpu.models.hrnet import MatmulBN

        x = jax.random.normal(jax.random.PRNGKey(5), (4, 8, 8, 18),
                              jnp.float32)
        ref = nn.BatchNorm(use_running_average=False, momentum=0.99,
                           epsilon=1e-5, dtype=jnp.float32)
        mm = MatmulBN(momentum=0.99, epsilon=1e-5, custom_vjp=custom_vjp,
                      dtype=jnp.float32)
        v = ref.init(jax.random.PRNGKey(0), x)

        def loss(mod, params, xx):
            y, _ = mod.apply({"params": params,
                              "batch_stats": v["batch_stats"]}, xx,
                             mutable=["batch_stats"])
            return jnp.sum(y * y)

        g_ref = jax.grad(loss, argnums=(1, 2))(ref, v["params"], x)
        g_mm = jax.grad(loss, argnums=(1, 2))(mm, v["params"], x)
        for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_mm)):
            np.testing.assert_allclose(b, a, rtol=5e-4, atol=5e-5)


class TestConvBNFuse:
    """HCMOCO_CONVBN_FUSE=1 (conv-epilogue BN stats, the VERDICT-r3 MFU
    experiment) must be math-equivalent to the unfused ConvBN at the 1x1
    sites it rewrites: same param tree, same forward/batch_stats, same
    grads to f32 rounding (ops/pallas/matmul_bn.py)."""

    def _run(self, monkeypatch, fuse: bool, kernel: int = 1):
        from hcmoco_tpu.models.hrnet import ConvBN

        if fuse:
            monkeypatch.setenv("HCMOCO_CONVBN_FUSE", "1")
        else:
            monkeypatch.delenv("HCMOCO_CONVBN_FUSE", raising=False)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 12),
                              jnp.float32) * 1.5 + 0.3
        cb = ConvBN(20, kernel, 1, use_relu=True, dtype=jnp.float32)
        v = cb.init(jax.random.PRNGKey(0), x, train=True)

        def loss(params, xx):
            y, mut = cb.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                xx, train=True, mutable=["batch_stats"])
            return jnp.sum(y * y), (y, mut)

        (l, (y, mut)), g = jax.value_and_grad(loss, has_aux=True)(
            v["params"], x)
        return v, l, y, mut, g

    def test_fused_matches_unfused(self, monkeypatch):
        v0, l0, y0, m0, g0 = self._run(monkeypatch, fuse=False)
        v1, l1, y1, m1, g1 = self._run(monkeypatch, fuse=True)
        assert (jax.tree_util.tree_structure(v0)
                == jax.tree_util.tree_structure(v1))
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=2e-5, atol=2e-5)
        for a, b in zip(jax.tree_util.tree_leaves(m0),
                        jax.tree_util.tree_leaves(m1)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-5, atol=2e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-4, atol=5e-5)

    def test_3x3_sites_unaffected(self, monkeypatch):
        """The fuse flag must leave non-1x1 ConvBN sites bit-identical."""
        v0, l0, y0, m0, g0 = self._run(monkeypatch, fuse=False, kernel=3)
        v1, l1, y1, m1, g1 = self._run(monkeypatch, fuse=True, kernel=3)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y0))

    def test_row_padding_exact(self, monkeypatch):
        """R % tile != 0 exercises the kernel's zero-row padding: the sums
        and outputs must be unaffected by the pad rows."""
        from hcmoco_tpu.ops.pallas.matmul_bn import conv1x1_bn_stats

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((130, 12)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((12, 20)).astype(np.float32))
        y, s1, s2 = conv1x1_bn_stats(x, w, 64)
        y_ref = x @ w
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s1),
                                   np.asarray(y_ref.sum(0)), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(s2),
                                   np.asarray((y_ref * y_ref).sum(0)),
                                   rtol=1e-5)


class TestHeads:
    def test_l2_normalize(self):
        x = jnp.array([[3.0, 4.0]])
        np.testing.assert_allclose(l2_normalize(x),
                                   [[0.6, 0.8]], rtol=1e-6)

    def test_gaussian_blur_preserves_shape_and_mass(self):
        x = jnp.ones((1, 8, 8, 4))
        y = gaussian_blur_nhwc(x, 5, 1.0)
        assert y.shape == x.shape
        np.testing.assert_allclose(np.asarray(y), 1.0, rtol=1e-5)
