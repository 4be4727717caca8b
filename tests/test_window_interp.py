"""Windowed weighted 3-NN interpolate kernel vs the XLA path (CUDA
three_interpolate semantics: out[b, q, :] = sum_k w[b,q,k] *
features[b, idx[b,q,k], :]).

Runs the Pallas path in interpret mode (CPU, force=True); correctness on
real TPU hardware is exercised by the HRNetPN bench/dryrun paths.
Reference spec: pycontrast/networks/pointnet2/src/interpolate_gpu.cu:77-154
(forward + grad kernels; grad only w.r.t. features — three_nn has no
backward, so the weights carry no gradient).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hcmoco_tpu.ops.pallas.window_interp import (window_interpolate,
                                                 _xla_interp)

pytestmark = pytest.mark.filterwarnings("error::RuntimeWarning")


def _local_idx_wgt(rng, b, n, m, spread):
    """3-NN-like indices within +-spread of floor(q*M/N), normalized
    inverse-distance-style weights."""
    base = ((np.arange(n) * m) // n)[None, :, None]
    idx = base + rng.integers(-spread, spread + 1, (b, n, 3))
    idx = np.clip(idx, 0, m - 1).astype(np.int32)
    w = rng.random((b, n, 3)).astype(np.float32) + 1e-3
    w = w / w.sum(-1, keepdims=True)
    return jnp.asarray(idx), jnp.asarray(w)


class TestWindowInterpolate:
    @pytest.mark.parametrize("n,m,c", [(256, 256, 8), (256, 64, 24),
                                       (512, 128, 16)])
    def test_forward_matches_xla(self, n, m, c):
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.standard_normal((2, m, c)).astype(np.float32))
        idx, w = _local_idx_wgt(rng, 2, n, m, spread=10)
        out = window_interpolate(feats, idx, w, window=16, tn=64, force=True)
        ref = _xla_interp(feats, idx, w)
        # f32: HIGHEST-precision one-hot dots re-sum full mantissas; the
        # only difference vs the XLA path is the f32 MXU sum order
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_grad_matches_xla(self):
        rng = np.random.default_rng(1)
        n, m, c = 256, 64, 16
        feats = jnp.asarray(rng.standard_normal((2, m, c)).astype(np.float32))
        idx, w = _local_idx_wgt(rng, 2, n, m, spread=10)
        cot = jnp.asarray(rng.standard_normal((2, n, c)).astype(np.float32))

        g_win = jax.grad(lambda f: jnp.sum(window_interpolate(
            f, idx, w, window=16, tn=64, force=True) * cot))(feats)
        g_xla = jax.grad(lambda f: jnp.sum(_xla_interp(f, idx, w)
                                           * cot))(feats)
        np.testing.assert_allclose(np.asarray(g_win), np.asarray(g_xla),
                                   rtol=1e-5, atol=1e-5)

    def test_hybrid_xla_bwd_grad_matches(self):
        """bwd='xla' (hybrid: windowed fwd + XLA scatter bwd) must give
        the same features-grad as both the kernel bwd and the plain XLA
        path, and the same forward values."""
        rng = np.random.default_rng(8)
        n, m, c = 256, 64, 16
        feats = jnp.asarray(rng.standard_normal((2, m, c)).astype(np.float32))
        idx, w = _local_idx_wgt(rng, 2, n, m, spread=10)
        cot = jnp.asarray(rng.standard_normal((2, n, c)).astype(np.float32))

        def loss(f, bwd):
            return jnp.sum(window_interpolate(
                f, idx, w, window=16, tn=64, force=True, bwd=bwd) * cot)

        out_h = window_interpolate(feats, idx, w, window=16, tn=64,
                                   force=True, bwd="xla")
        np.testing.assert_allclose(np.asarray(out_h),
                                   np.asarray(_xla_interp(feats, idx, w)),
                                   rtol=1e-6, atol=1e-6)
        g_h = jax.grad(lambda f: loss(f, "xla"))(feats)
        g_k = jax.grad(lambda f: loss(f, "kernel"))(feats)
        g_xla = jax.grad(lambda f: jnp.sum(_xla_interp(f, idx, w)
                                           * cot))(feats)
        np.testing.assert_allclose(np.asarray(g_h), np.asarray(g_xla),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g_h), np.asarray(g_k),
                                   rtol=1e-5, atol=1e-5)

    def test_weight_cotangent_is_zero_and_unused(self):
        """The kernel declares zero weight-grad (reference three_nn has no
        backward); assert the declared cotangent is exactly zero so any
        future caller that DOES need weight grads fails loudly here."""
        rng = np.random.default_rng(2)
        n, m, c = 256, 64, 8
        feats = jnp.asarray(rng.standard_normal((2, m, c)).astype(np.float32))
        idx, w = _local_idx_wgt(rng, 2, n, m, spread=10)
        gw = jax.grad(lambda ww: jnp.sum(window_interpolate(
            feats, idx, ww, window=16, tn=64, force=True)))(w)
        np.testing.assert_array_equal(np.asarray(gw), 0.0)

    def test_violation_falls_back_exact(self):
        rng = np.random.default_rng(3)
        n, m, c = 256, 256, 8
        feats = jnp.asarray(rng.standard_normal((2, m, c)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, m, (2, n, 3)).astype(np.int32))
        w = jnp.asarray((rng.random((2, n, 3)) + 1e-3).astype(np.float32))
        out = window_interpolate(feats, idx, w, window=8, tn=64, force=True)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(_xla_interp(feats, idx, w)),
                                   rtol=1e-6, atol=1e-6)

    def test_rowuniform_violators_stay_fast_and_exact(self):
        rng = np.random.default_rng(4)
        n, m, c = 256, 64, 8
        feats = rng.standard_normal((2, m, c)).astype(np.float32)
        feats[1] = feats[1, :1]  # zero-cloud analog: row-uniform
        idx, w = _local_idx_wgt(rng, 2, n, m, spread=10)
        idx = np.asarray(idx).copy()
        idx[1] = rng.integers(0, m, (n, 3))  # wild indices, uniform rows
        out = window_interpolate(jnp.asarray(feats), jnp.asarray(idx), w,
                                 window=16, tn=64, force=True)
        ref = _xla_interp(jnp.asarray(feats), jnp.asarray(idx), w)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_sample_ok_exempts_masked_violators(self):
        """Samples marked sample_ok=False are exempt from the exactness
        cond: the batch stays on the fast path even when their (wild,
        non-row-uniform-table) indices violate the window.  Valid samples
        must stay exact; the masked sample's output must follow the
        kernel's documented per-tile clamp — the HRNetPN zero-cloud
        contract (loss-masked samples, see window_interpolate)."""
        rng = np.random.default_rng(9)
        n, m, c, w, tn = 256, 64, 8, 16, 64
        feats = jnp.asarray(rng.standard_normal((2, m, c)).astype(np.float32))
        idx, wgt = _local_idx_wgt(rng, 2, n, m, spread=10)
        idx = np.asarray(idx).copy()
        idx[1] = rng.integers(0, m, (n, 3))  # violating, table NOT uniform
        ok = jnp.asarray([True, False])
        out = window_interpolate(feats, jnp.asarray(idx), wgt, window=w,
                                 tn=tn, force=True, sample_ok=ok)
        ref = _xla_interp(feats, jnp.asarray(idx), wgt)
        # valid sample: exact
        np.testing.assert_allclose(np.asarray(out)[0], np.asarray(ref)[0],
                                   rtol=1e-6, atol=1e-6)
        # masked sample: fast path ran (clamped != true gather) and the
        # values match the per-tile clamp reference
        ts = tn * m // n
        base = (np.arange(n) // tn) * ts
        clamped = np.clip(idx[1], np.maximum(0, base - w)[:, None],
                          np.minimum(m - 1, base + ts + w - 1)[:, None])
        ref_clamp = _xla_interp(feats[1:], jnp.asarray(clamped[None]),
                                wgt[1:])
        np.testing.assert_allclose(np.asarray(out)[1],
                                   np.asarray(ref_clamp)[0],
                                   rtol=1e-6, atol=1e-6)
        assert not np.allclose(np.asarray(out)[1], np.asarray(ref)[1])

    def test_sample_ok_true_violators_still_fall_back(self):
        """A violating sample marked sample_ok=True keeps the cond live:
        the whole batch takes the exact XLA fallback."""
        rng = np.random.default_rng(10)
        n, m, c = 256, 64, 8
        feats = jnp.asarray(rng.standard_normal((2, m, c)).astype(np.float32))
        idx, wgt = _local_idx_wgt(rng, 2, n, m, spread=10)
        idx = np.asarray(idx).copy()
        idx[1] = rng.integers(0, m, (n, 3))
        out = window_interpolate(feats, jnp.asarray(idx), wgt, window=16,
                                 tn=64, force=True,
                                 sample_ok=jnp.asarray([True, True]))
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(_xla_interp(
                                       feats, jnp.asarray(idx), wgt)),
                                   rtol=1e-6, atol=1e-6)

    def test_bf16_values(self):
        rng = np.random.default_rng(5)
        n, m, c = 256, 64, 8
        feats = jnp.asarray(rng.standard_normal((2, m, c)).astype(
            np.float32)).astype(jnp.bfloat16)
        idx, w = _local_idx_wgt(rng, 2, n, m, spread=10)
        out = window_interpolate(feats, idx, w, window=16, tn=64,
                                 force=True)
        assert out.dtype == jnp.bfloat16
        # bf16: kernel accumulates the 3-term sum in f32 (like the CUDA
        # reference) where XLA sums in bf16 — compare vs an f32 reference
        ref = _xla_interp(feats.astype(jnp.float32), idx, w)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref), rtol=2e-2, atol=2e-2)

    def test_untileable_uses_xla(self):
        rng = np.random.default_rng(6)
        n, m, c = 100, 30, 8  # (tn*m) % n != 0
        feats = jnp.asarray(rng.standard_normal((2, m, c)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, m, (2, n, 3)).astype(np.int32))
        w = jnp.asarray(rng.random((2, n, 3)).astype(np.float32))
        out = window_interpolate(feats, idx, w, window=16, tn=64, force=True)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(_xla_interp(feats, idx, w)),
                                   rtol=1e-6, atol=1e-6)


class TestFPModuleWindowed:
    def test_fp_module_windowed_matches_unwindowed(self, monkeypatch):
        """FPModule with HCMOCO_FP_WINDOW=1 + force (interpret kernel on
        CPU) must match the plain path through the full module."""
        from hcmoco_tpu.models.pointnet2_model import FPModule

        monkeypatch.setenv("HCMOCO_PN_FORCE_WG", "1")
        rng = np.random.default_rng(7)
        b, n, m, c = 2, 256, 64, 16
        # raster-ordered coordinates -> 3-NN indices near the linear base
        t_un = np.sort(rng.random((b, n)).astype(np.float32), axis=1)
        t_kn = np.sort(rng.random((b, m)).astype(np.float32), axis=1)
        unknown = jnp.stack([jnp.asarray(t_un)] * 3, axis=-1)
        known = jnp.stack([jnp.asarray(t_kn)] * 3, axis=-1)
        kf = jnp.asarray(rng.standard_normal((b, m, c)).astype(np.float32))

        def run(window):
            monkeypatch.setenv("HCMOCO_FP_WINDOW",
                               "1" if window else "0")
            fp = FPModule((32,), window=64)
            v = fp.init(jax.random.PRNGKey(0), unknown, known, None, kf,
                        True)
            return fp.apply(v, unknown, known, None, kf, True,
                            mutable=["batch_stats"])[0]

        out_plain = run(False)
        out_win = run(True)
        np.testing.assert_allclose(np.asarray(out_win),
                                   np.asarray(out_plain),
                                   rtol=1e-5, atol=1e-5)
