"""Windowed one-hot grouping kernel vs the XLA gather (CUDA group_points
semantics: out[b, m, s, :] = table[b, idx[b, m, s], :]).

Runs the Pallas path in interpret mode (CPU, force=True); correctness on
real TPU hardware is exercised by the HRNetPN bench/dryrun paths.
Reference spec: pycontrast/networks/pointnet2/src/group_points_gpu.cu:9-41.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hcmoco_tpu.ops.pallas.window_group import window_group, _round_window


def _xla(table, gidx):
    b, m, s = gidx.shape
    out = jnp.take_along_axis(
        table, gidx.reshape(b, m * s, 1).astype(jnp.int32), axis=1)
    return out.reshape(b, m, s, table.shape[-1])


def _local_gidx(rng, b, m, s, n, spread):
    """Indices within +-spread of the linear center base."""
    base = (np.arange(m) * (n // m))[None, :, None]
    g = base + rng.integers(-spread, spread + 1, (b, m, s))
    return np.clip(g, 0, n - 1).astype(np.int32)


class TestWindowGroup:
    @pytest.mark.parametrize("n,m,s,c", [(256, 256, 4, 8), (256, 64, 4, 24)])
    def test_forward_exact_in_window(self, n, m, s, c):
        rng = np.random.default_rng(0)
        table = jnp.asarray(rng.standard_normal((2, n, c)).astype(np.float32))
        gidx = jnp.asarray(_local_gidx(rng, 2, m, s, n, spread=12))
        out = window_group(table, gidx, window=16, tm=8, force=True)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(_xla(table, gidx)))

    def test_grad_matches_xla(self):
        rng = np.random.default_rng(1)
        n, m, s, c = 256, 256, 4, 8
        table = jnp.asarray(rng.standard_normal((2, n, c)).astype(np.float32))
        gidx = jnp.asarray(_local_gidx(rng, 2, m, s, n, spread=12))
        cot = jnp.asarray(rng.standard_normal((2, m, s, c)).astype(np.float32))

        def loss(fn, t):
            return jnp.sum(fn(t, gidx) * cot)

        g_win = jax.grad(lambda t: loss(
            lambda t, g: window_group(t, g, window=16, tm=8, force=True),
            t))(table)
        g_xla = jax.grad(lambda t: loss(_xla, t))(table)
        np.testing.assert_allclose(np.asarray(g_win), np.asarray(g_xla),
                                   rtol=1e-5, atol=1e-5)

    def test_violation_falls_back_exact(self):
        rng = np.random.default_rng(2)
        n, m, s, c = 256, 256, 4, 8
        table = jnp.asarray(rng.standard_normal((2, n, c)).astype(np.float32))
        gidx = jnp.asarray(
            rng.integers(0, n, (2, m, s)).astype(np.int32))  # global spread
        out = window_group(table, gidx, window=8, tm=8, force=True)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(_xla(table, gidx)))

    def test_rowuniform_violators_stay_on_fast_path(self):
        rng = np.random.default_rng(3)
        n, m, s, c = 256, 256, 4, 8
        tab = rng.standard_normal((2, n, c)).astype(np.float32)
        tab[1] = tab[1, :1]  # sample 1 row-uniform (zero-cloud analog)
        gidx = _local_gidx(rng, 2, m, s, n, spread=12)
        gidx[1] = rng.integers(0, n, (m, s))  # wild indices, uniform rows
        out = window_group(jnp.asarray(tab), jnp.asarray(gidx),
                           window=16, tm=8, force=True)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(_xla(jnp.asarray(tab),
                                                      jnp.asarray(gidx))))

    def test_strided_table(self):
        # m < n: stride-4 centers (SA1-like); windows in table rows
        rng = np.random.default_rng(4)
        n, m, s, c = 512, 128, 8, 16
        table = jnp.asarray(rng.standard_normal((2, n, c)).astype(np.float32))
        gidx = jnp.asarray(_local_gidx(rng, 2, m, s, n, spread=30))
        out = window_group(table, gidx, window=32, tm=8, force=True)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(_xla(table, gidx)))

    def test_bf16_bit_exact_rows(self):
        rng = np.random.default_rng(5)
        n, m, s, c = 256, 256, 4, 8
        table = jnp.asarray(
            rng.standard_normal((1, n, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        gidx = jnp.asarray(_local_gidx(rng, 1, m, s, n, spread=12))
        out = window_group(table, gidx, window=16, tm=8, force=True)
        np.testing.assert_array_equal(
            np.asarray(out.astype(jnp.float32)),
            np.asarray(_xla(table, gidx).astype(jnp.float32)))

    def test_untileable_uses_xla(self):
        rng = np.random.default_rng(6)
        n, m, s, c = 100, 30, 4, 8  # n % m != 0
        table = jnp.asarray(rng.standard_normal((2, n, c)).astype(np.float32))
        gidx = jnp.asarray(rng.integers(0, n, (2, m, s)).astype(np.int32))
        out = window_group(table, gidx, window=16, tm=8, force=True)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(_xla(table, gidx)))

    @pytest.mark.parametrize("s,tm", [(16, 8), (32, 16)])
    def test_lane_packed_index_path(self, s, tm, monkeypatch):
        # (rb // t_tiles) % 128 == 0 engages the lane-packed gidx layout
        # (window_group.py::_load_rows — one band at s=16/tm=8, four bands
        # at s=32/tm=16); must match the legacy layout AND the XLA gather
        # exactly, forward and grad.
        rng = np.random.default_rng(7)
        n, m, c = 256, 256, 8
        table = jnp.asarray(rng.standard_normal((2, n, c)).astype(np.float32))
        gidx = jnp.asarray(_local_gidx(rng, 2, m, s, n, spread=12))
        cot = jnp.asarray(rng.standard_normal((2, m, s, c)).astype(np.float32))

        def run(t):
            return window_group(t, gidx, window=16, tm=tm, force=True)

        out, grad = run(table), jax.grad(
            lambda t: jnp.sum(run(t) * cot))(table)
        monkeypatch.setenv("HCMOCO_WG_PACKIDX", "0")
        out_legacy, grad_legacy = run(table), jax.grad(
            lambda t: jnp.sum(run(t) * cot))(table)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(_xla(table, gidx)))
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(out_legacy))
        np.testing.assert_array_equal(np.asarray(grad), np.asarray(grad_legacy))

    def test_round_window(self):
        assert _round_window(224, 64) == (224, 8)
        assert _round_window(1, 64) == (32, 2)
        assert _round_window(640, 256) == (640, 6)
        w, k = _round_window(500, 256)
        assert w == 512 and k == 5
