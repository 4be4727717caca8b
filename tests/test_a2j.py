"""A2J anchor-machinery golden parity (vs reference torch math) + model
shape tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hcmoco_tpu.downstream.a2j.anchors import (
    generate_anchors, shift_anchors, post_process, a2j_loss,
)
from hcmoco_tpu.downstream.a2j.model import A2JHRNet, A2JResNet
from hcmoco_tpu.downstream.a2j.data import (
    crop_human_pcd, evaluation_10cm, pixel2world, world2pixel,
)

GOLDEN = np.load(os.path.join(os.path.dirname(__file__), "golden",
                              "a2j_golden.npz"))
P_HW = np.array([1, 2, 3])


class TestAnchorGolden:
    def test_anchor_grid_matches(self):
        a = shift_anchors((8, 8), 4, generate_anchors(P_HW, P_HW))
        np.testing.assert_allclose(a, GOLDEN["anchors"])

    def test_post_process_matches(self):
        heads = (jnp.asarray(GOLDEN["cls"]), jnp.asarray(GOLDEN["reg"]),
                 jnp.asarray(GOLDEN["dep"]))
        anchors = jnp.asarray(GOLDEN["anchors"], jnp.float32)
        keys = post_process(heads, anchors)
        np.testing.assert_allclose(np.asarray(keys), GOLDEN["keys"],
                                   rtol=1e-4, atol=1e-5)

    def test_loss_matches(self):
        heads = (jnp.asarray(GOLDEN["cls"]), jnp.asarray(GOLDEN["reg"]),
                 jnp.asarray(GOLDEN["dep"]))
        anchors = jnp.asarray(GOLDEN["anchors"], jnp.float32)
        cls_l, reg_l = a2j_loss(heads, jnp.asarray(GOLDEN["ann"]), anchors,
                                spatial_factor=0.5)
        np.testing.assert_allclose(float(cls_l), GOLDEN["cls_loss"],
                                   rtol=1e-4)
        np.testing.assert_allclose(float(reg_l), GOLDEN["reg_loss"],
                                   rtol=1e-4)


class TestA2JModel:
    def test_head_shapes(self):
        model = A2JHRNet(num_classes=15, num_anchors=9, width=4,
                         dtype=jnp.float32)
        x = jnp.zeros((2, 32, 32, 1))
        v = model.init(jax.random.PRNGKey(0), x, train=False)
        cls, reg, dep = model.apply(v, x, train=False)
        n = (32 // 4) * (32 // 4) * 9
        assert cls.shape == (2, n, 15)
        assert reg.shape == (2, n, 15, 2)
        assert dep.shape == (2, n, 15)


class TestA2JResNetLegacy:
    """Legacy ResNet50 A2J variant (A2J/model.py:147-195, main.py:296-300):
    stride-16 anchors, cls head on layer3 (1024ch), reg/depth on layer4
    (2048ch, dilated stride-1 so both grids are H/16 x W/16)."""

    def test_head_shapes_and_grid(self):
        model = A2JResNet(num_classes=15, num_anchors=16,
                          dtype=jnp.float32)
        x = jnp.zeros((1, 64, 64, 1))
        v = model.init(jax.random.PRNGKey(0), x, train=False)
        cls, reg, dep = model.apply(v, x, train=False)
        n = (64 // 16) * (64 // 16) * 16  # both heads on the stride-16 grid
        assert cls.shape == (1, n, 15)
        assert reg.shape == (1, n, 15, 2)
        assert dep.shape == (1, n, 15)

    def test_backbone_channels(self):
        # layer3 -> 1024ch (cls input), layer4 -> 2048ch (reg/depth input),
        # matching A2J_model's head widths (A2J/model.py:180-184)
        from hcmoco_tpu.downstream.a2j.model import A2JResNetBackbone
        bb = A2JResNetBackbone(dtype=jnp.float32)
        x = jnp.zeros((1, 64, 64, 3))
        v = bb.init(jax.random.PRNGKey(0), x, train=False)
        x3, x4 = bb.apply(v, x, train=False)
        assert x3.shape == (1, 4, 4, 1024)
        assert x4.shape == (1, 4, 4, 2048)  # stride-1 dilated layer4

    def test_legacy_anchor_grid(self):
        # P_h=P_w=None -> the 16-anchor [2,6,10,14]^2 default
        # (anchor.py:7-25)
        a = generate_anchors(None, None)
        assert a.shape == (16, 2)
        assert set(a[:, 0]) == {2, 6, 10, 14}
        grid = shift_anchors((4, 4), 16, a)
        assert grid.shape == (4 * 4 * 16, 2)


class TestITOPHelpers:
    def test_pixel_world_roundtrip(self):
        x, y, z = 100.0, 80.0, 3.0
        wx, wy = pixel2world(x, y, z)
        px, py = world2pixel(wx, wy, z)
        assert abs(px - x) < 1e-4 and abs(py - y) < 1e-4

    def test_crop_human_pcd(self):
        d = np.array([[1.0, 2.0], [5.0, 0.0]], np.float32)
        f, mean = crop_human_pcd(d, np.array([1.5, 2.0]))
        assert f[1, 0] == 0  # beyond max_z + 0.05
        np.testing.assert_allclose(mean, 1.5)

    def test_eval_10cm_perfect_predictions(self):
        n, p = 3, 15
        rng = np.random.default_rng(0)
        world = np.stack([rng.uniform(-1, 1, (n, p)),
                          rng.uniform(-1, 1, (n, p)),
                          rng.uniform(2, 4, (n, p))], -1)
        bnd = np.tile(np.array([40.0, 20.0, 40 + 288, 20 + 288]), (n, 1))
        means = rng.uniform(2, 3, n)
        # build the prediction that maps exactly back to `world`
        px, py = world2pixel(world[..., 0], world[..., 1], world[..., 2])
        cx = (px - bnd[:, 0][:, None]) * 288 / (bnd[:, 2] - bnd[:, 0])[:, None]
        cy = (py - bnd[:, 1][:, None]) * 288 / (bnd[:, 3] - bnd[:, 1])[:, None]
        pred = np.stack([cy, cx,
                         (world[..., 2] - means[:, None]) * 50.0], -1)
        acc = evaluation_10cm(pred, world, bnd, means)
        assert acc == 1.0
