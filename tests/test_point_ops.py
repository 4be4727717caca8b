"""Property tests for the point-cloud ops: numpy brute-force models of the
CUDA kernel semantics (SURVEY.md §2.4 / §4 prescription (1)) vs both the
XLA formulation and the Pallas kernels (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hcmoco_tpu.ops.point_ops import (
    furthest_point_sample, ball_query, gather_points, group_points,
    query_and_group, three_nn, three_interpolate, interpolation_weights,
)

# The PN ops must stay RuntimeWarning-clean (VERDICT r3: the three_nn pad
# sentinel's overflow cast polluted the multichip certification artifact).
pytestmark = pytest.mark.filterwarnings("error::RuntimeWarning")


def np_fps(xyz, npoint):
    """Brute-force FPS per sampling_gpu.cu:93-253."""
    b, n, _ = xyz.shape
    out = np.zeros((b, npoint), np.int32)
    for bi in range(b):
        mind = np.full(n, 1e10)
        last = 0
        for j in range(1, npoint):
            d = ((xyz[bi] - xyz[bi, last]) ** 2).sum(-1)
            mind = np.minimum(mind, d)
            last = int(np.argmax(mind))
            out[bi, j] = last
    return out


def np_ball_query(xyz, new_xyz, radius, nsample):
    """Brute-force first-hit-fill per ball_query_gpu.cu:28-43."""
    b, m, _ = new_xyz.shape
    out = np.zeros((b, m, nsample), np.int32)
    for bi in range(b):
        for mi in range(m):
            d2 = ((xyz[bi] - new_xyz[bi, mi]) ** 2).sum(-1)
            cnt = 0
            for k in range(xyz.shape[1]):
                if d2[k] < radius * radius:
                    if cnt == 0:
                        out[bi, mi, :] = k
                    out[bi, mi, cnt] = k
                    cnt += 1
                    if cnt >= nsample:
                        break
    return out


def np_three_nn(unknown, known):
    b, n, _ = unknown.shape
    d_out = np.zeros((b, n, 3), np.float32)
    i_out = np.zeros((b, n, 3), np.int32)
    for bi in range(b):
        d2 = ((unknown[bi][:, None] - known[bi][None]) ** 2).sum(-1)
        idx = np.argsort(d2, axis=-1, kind="stable")[:, :3]
        i_out[bi] = idx
        d_out[bi] = np.take_along_axis(d2, idx, axis=-1)
    return d_out, i_out


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(0)
    return rng.standard_normal((2, 128, 3)).astype(np.float32)


class TestFPS:
    def test_xla_matches_bruteforce(self, cloud):
        got = np.asarray(furthest_point_sample(jnp.asarray(cloud), 16))
        want = np_fps(cloud, 16)
        np.testing.assert_array_equal(got, want)

    def test_pallas_matches_bruteforce(self, cloud):
        got = np.asarray(
            furthest_point_sample(jnp.asarray(cloud), 16, impl="pallas"))
        want = np_fps(cloud, 16)
        np.testing.assert_array_equal(got, want)

    def test_full_permutation(self, cloud):
        idx = np.asarray(furthest_point_sample(jnp.asarray(cloud[:1]), 128))
        assert sorted(idx[0].tolist()) == list(range(128))

    def test_npoint_equals_n_default_is_fps_order(self, cloud):
        # without the opt-in, npoint==n still returns the true FPS visit
        # order (a caller may take the first m entries as an FPS subset)
        got = np.asarray(furthest_point_sample(jnp.asarray(cloud[:1]), 128))
        want = np_fps(cloud[:1], 128)
        np.testing.assert_array_equal(got, want)

    def test_npoint_equals_n_identity_optin(self, cloud):
        got = np.asarray(furthest_point_sample(
            jnp.asarray(cloud), 128, allow_identity=True))
        np.testing.assert_array_equal(
            got, np.broadcast_to(np.arange(128, dtype=np.int32), (2, 128)))


class TestBallQuery:
    @pytest.mark.parametrize("impl", ["xla", "pallas"])
    def test_matches_bruteforce(self, cloud, impl):
        centroids = cloud[:, :32]
        got = np.asarray(ball_query(jnp.asarray(cloud),
                                    jnp.asarray(centroids), 0.5, 8,
                                    chunk=16, impl=impl))
        want = np_ball_query(cloud, centroids, 0.5, 8)
        np.testing.assert_array_equal(got, want)

    def test_first_hit_fill_underfull(self):
        # one point inside radius -> all slots get that index
        xyz = np.zeros((1, 4, 3), np.float32)
        xyz[0, 1] = [0.1, 0, 0]
        xyz[0, 2] = [5, 5, 5]
        xyz[0, 3] = [9, 9, 9]
        new = np.array([[[0.09, 0, 0]]], np.float32)
        got = np.asarray(ball_query(jnp.asarray(xyz), jnp.asarray(new),
                                    0.05, 4))
        np.testing.assert_array_equal(got[0, 0], [1, 1, 1, 1])


class TestGathers:
    def test_gather_points(self, cloud):
        idx = jnp.asarray([[0, 5, 7], [1, 2, 3]], jnp.int32)
        got = np.asarray(gather_points(jnp.asarray(cloud), idx))
        for bi in range(2):
            np.testing.assert_array_equal(got[bi],
                                          cloud[bi, np.asarray(idx)[bi]])

    def test_group_points_and_grad(self, cloud):
        feats = jnp.asarray(cloud)  # reuse as (B, N, 3) features
        idx = jnp.zeros((2, 4, 2), jnp.int32)

        def f(x):
            return group_points(x, idx).sum()

        g = jax.grad(f)(feats)
        # every group element points at index 0 -> grad accumulates there
        assert float(g[0, 0, 0]) == pytest.approx(8.0)
        assert float(g[0, 1, 0]) == 0.0


class TestQueryAndGroup:
    """Combined-table ball-query+group vs the brute-force CUDA-semantics
    model + manual center/concat (QueryAndGroup use_xyz=True,
    pointnet2_utils.py:231-290)."""

    def _reference(self, cloud, centroids, feats, radius, nsample):
        gidx = np_ball_query(cloud, centroids, radius, nsample)
        out = []
        for bi in range(cloud.shape[0]):
            gx = cloud[bi][gidx[bi]] - centroids[bi][:, None, :]
            if feats is None:
                out.append(gx)
            else:
                out.append(np.concatenate([gx, feats[bi][gidx[bi]]], -1))
        return np.stack(out)

    @pytest.mark.parametrize("with_feats", [False, True])
    def test_matches_bruteforce(self, cloud, with_feats):
        rng = np.random.default_rng(7)
        feats = (rng.standard_normal((2, 128, 20)).astype(np.float32)
                 if with_feats else None)
        centroids = cloud[:, :40]
        got = np.asarray(query_and_group(
            jnp.asarray(cloud), jnp.asarray(centroids),
            None if feats is None else jnp.asarray(feats), 0.5, 8))
        want = self._reference(cloud, centroids, feats, 0.5, 8)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_feature_grad_is_scatter_add(self, cloud):
        rng = np.random.default_rng(8)
        feats = jnp.asarray(rng.standard_normal((2, 128, 20)),
                            jnp.float32)
        centroids = jnp.asarray(cloud[:, :16])

        def f(ft):
            return (query_and_group(jnp.asarray(cloud), centroids, ft,
                                    0.5, 8) ** 2).sum()

        g = np.asarray(jax.grad(f)(feats))
        # dense-path reference: grad of sum of squares of gathered rows =
        # 2 * scatter-add of gathered values
        gidx = np_ball_query(np.asarray(cloud), np.asarray(centroids),
                             0.5, 8)
        want = np.zeros_like(np.asarray(feats))
        for bi in range(2):
            for mi in range(gidx.shape[1]):
                for si in range(8):
                    k = gidx[bi, mi, si]
                    want[bi, k] += 2 * np.asarray(feats)[bi, k]
        np.testing.assert_allclose(g, want, rtol=1e-4, atol=1e-5)


class TestThreeNN:
    @pytest.mark.parametrize("impl", ["xla", "pallas"])
    def test_matches_bruteforce(self, cloud, impl):
        known = cloud[:, :32]
        d2, idx = three_nn(jnp.asarray(cloud), jnp.asarray(known),
                           chunk=64, impl=impl)
        want_d, want_i = np_three_nn(cloud, known)
        np.testing.assert_array_equal(np.asarray(idx), want_i)
        np.testing.assert_allclose(np.asarray(d2), want_d, rtol=1e-4,
                                   atol=1e-6)

    def test_interpolate_weighted_sum(self):
        feats = jnp.asarray(np.eye(4, 5, dtype=np.float32))[None]  # (1,4,5)
        idx = jnp.asarray([[[0, 1, 2]]], jnp.int32)  # (1,1,3)
        w = jnp.asarray([[[0.5, 0.3, 0.2]]], jnp.float32)
        out = np.asarray(three_interpolate(feats, idx, w))
        np.testing.assert_allclose(out[0, 0, :3], [0.5, 0.3, 0.2],
                                   rtol=1e-6)

    def test_weights_normalize(self):
        d2 = jnp.asarray([[[1.0, 1.0, 2.0]]])
        w = np.asarray(interpolation_weights(d2))
        np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-6)
        assert w[0, 0, 0] == w[0, 0, 1] > w[0, 0, 2]


class TestBallQueryWindowed:
    """ball_query_windowed: windowed sweep + violation fallback
    (pallas/ball_query.py; exploits raster-sorted locality like
    window_group).  Interpret mode on CPU."""

    @staticmethod
    def _raster_cloud(b=2, n=1024, jitter=0.02, seed=0):
        # points sorted along x => in-radius neighbors are index-local
        rng = np.random.default_rng(seed)
        x = np.arange(n, dtype=np.float32)[None, :] * 0.01
        yz = rng.standard_normal((b, n, 2)).astype(np.float32) * jitter
        return np.concatenate(
            [np.broadcast_to(x, (b, n))[..., None], yz], axis=-1)

    def test_matches_bruteforce_local(self):
        from hcmoco_tpu.ops.pallas.ball_query import ball_query_windowed

        cloud = self._raster_cloud()
        centers = cloud[:, ::2]  # m=512, stride 2, ascending
        got = np.asarray(ball_query_windowed(
            jnp.asarray(cloud), jnp.asarray(centers), 0.3, 8, 50))
        want = np_ball_query(cloud, centers, 0.3, 8)
        np.testing.assert_array_equal(got, want)

    def test_violation_falls_back_exact(self):
        from hcmoco_tpu.ops.pallas.ball_query import ball_query_windowed

        cloud = self._raster_cloud()
        # far-in-index, near-in-space point: violates every window bound
        cloud[0, 900] = cloud[0, 10]
        centers = cloud[:, ::2]
        got = np.asarray(ball_query_windowed(
            jnp.asarray(cloud), jnp.asarray(centers), 0.3, 8, 50))
        want = np_ball_query(cloud, centers, 0.3, 8)
        np.testing.assert_array_equal(got, want)

    def test_zero_cloud_rowuniform_values_exact(self):
        from hcmoco_tpu.ops.pallas.ball_query import ball_query_windowed

        cloud = np.zeros((2, 1024, 3), np.float32)
        centers = cloud[:, ::2]
        got = np.asarray(ball_query_windowed(
            jnp.asarray(cloud), jnp.asarray(centers), 0.3, 8, 50))
        assert ((got >= 0) & (got < 1024)).all()
        # indices may differ from the CUDA order on row-uniform samples,
        # but every gathered VALUE is identical
        want = np_ball_query(cloud, centers, 0.3, 8)
        np.testing.assert_array_equal(
            np.take_along_axis(cloud[..., 0], got.reshape(2, -1), 1),
            np.take_along_axis(cloud[..., 0], want.reshape(2, -1), 1))

    def test_untileable_shapes_fall_back(self):
        from hcmoco_tpu.ops.pallas.ball_query import ball_query_windowed

        cloud = self._raster_cloud(n=128)
        centers = cloud[:, :32]  # m=32 not a chunk multiple
        got = np.asarray(ball_query_windowed(
            jnp.asarray(cloud), jnp.asarray(centers), 0.5, 8, 50))
        want = np_ball_query(cloud, centers, 0.5, 8)
        np.testing.assert_array_equal(got, want)

    def test_wrapper_window_arg(self):
        cloud = self._raster_cloud()
        centers = cloud[:, ::2]
        got = np.asarray(ball_query(jnp.asarray(cloud),
                                    jnp.asarray(centers), 0.3, 8,
                                    impl="pallas", window=50))
        want = np_ball_query(cloud, centers, 0.3, 8)
        np.testing.assert_array_equal(got, want)
