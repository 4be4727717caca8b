"""Offline preprocessing tests: skeleton parsing (python + native parity),
RANSAC homography recovery, perspective warp vs cv2."""

import os
import tempfile

import numpy as np
import pytest

from hcmoco_tpu.data.preprocess import (
    parse_skeleton_file, _parse_skeleton_py, write_parsed_skeletons,
    homography_dlt, find_homography_ransac, apply_homography,
    warp_perspective, fit_video_set_homography,
)
from hcmoco_tpu.native import native_lib


def make_skeleton_file(tmp, n_frames=3, n_joints=25, seed=0):
    rng = np.random.default_rng(seed)
    lines = [str(n_frames)]
    for _ in range(n_frames):
        lines.append("1")  # one body
        lines.append("72057 0 0 0 0 0 0 0 0 2")  # body info
        lines.append(str(n_joints))
        for _ in range(n_joints):
            v = rng.uniform(0, 400, 7)
            lines.append(" ".join(f"{x:.4f}" for x in v) + " 0 0 0 0 2")
    path = os.path.join(tmp, "S001C001P001R001A001.skeleton")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


class TestSkeletonParse:
    def test_python_parser(self, tmp_path):
        path = make_skeleton_file(str(tmp_path))
        frames = _parse_skeleton_py(path)
        assert len(frames) == 3
        assert len(frames[0]["joints"]) == 1
        assert len(frames[0]["joints"][0]["3d_loc"]) == 25
        assert len(frames[0]["joints"][0]["d_loc"][0]) == 2

    def test_native_matches_python(self, tmp_path):
        lib = native_lib()
        if lib is None:
            pytest.skip("native lib unavailable")
        path = make_skeleton_file(str(tmp_path), seed=1)
        a = parse_skeleton_file(path)  # native path
        b = _parse_skeleton_py(path)
        for fa, fb in zip(a, b):
            for ja, jb in zip(fa["joints"], fb["joints"]):
                np.testing.assert_allclose(ja["3d_loc"], jb["3d_loc"],
                                           rtol=1e-5)
                np.testing.assert_allclose(ja["d_loc"], jb["d_loc"],
                                           rtol=1e-5)
                np.testing.assert_allclose(ja["rgb_loc"], jb["rgb_loc"],
                                           rtol=1e-5)

    def test_write_parsed_pkls(self, tmp_path):
        path = make_skeleton_file(str(tmp_path))
        out = os.path.join(str(tmp_path), "parsed")
        n = write_parsed_skeletons(path, out)
        assert n == 3
        assert sorted(os.listdir(out)) == [
            f"Skeleton-{i:08d}.pkl" for i in range(3)]


class TestHomography:
    def _make(self, seed=0, outliers=True):
        rng = np.random.default_rng(seed)
        h = np.array([[1.2, 0.1, 30], [0.05, 0.9, -20],
                      [1e-4, 2e-4, 1.0]])
        src = rng.uniform(0, 400, (400, 2))
        dst = apply_homography(h, src)
        noisy = dst + rng.normal(0, 0.3, dst.shape)
        if outliers:
            noisy[::8] += rng.uniform(60, 120, (50, 2))
        return h, src, dst, noisy

    def test_dlt_exact(self):
        h, src, dst, _ = self._make(outliers=False)
        est = homography_dlt(src, dst)
        np.testing.assert_allclose(est, h / h[2, 2], rtol=1e-5, atol=1e-6)

    def test_ransac_robust_to_outliers(self):
        h, src, dst, noisy = self._make()
        est = find_homography_ransac(src, noisy, thresh=3.0, iters=1000)
        err = np.linalg.norm(apply_homography(est, src) - dst,
                             axis=1).mean()
        assert err < 1.0

    def test_warp_matches_cv2(self):
        import cv2

        rng = np.random.default_rng(0)
        h, _, _, _ = self._make()
        img = rng.integers(0, 255, (100, 150, 3), dtype=np.uint8)
        ours = warp_perspective(img, h, (128, 96))
        ref = cv2.warpPerspective(img, h, (128, 96))
        # interior pixels: sub-quantization agreement (different edge and
        # fixed-point rules produce isolated boundary diffs)
        diff = np.abs(ours[4:-4, 4:-4].astype(int)
                      - ref[4:-4, 4:-4].astype(int))
        assert np.quantile(diff, 0.999) <= 2

    def test_fit_video_set(self, tmp_path):
        path = make_skeleton_file(str(tmp_path), n_frames=30)
        h = fit_video_set_homography([path], seed=0)
        assert h.shape == (3, 3)
        np.testing.assert_allclose(h[2, 2], 1.0, rtol=1e-9)
