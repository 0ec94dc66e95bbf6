"""Vis-utils breadth tests (VERDICT round-2 item 9): joint-plot grids and
UV overlay panels (reference utils/vis.py:378-606, utils/uv_vis.py:68-112).

PNG-diff style smoke checks: deterministic output, marks actually drawn,
reference naming conventions respected.
"""

import os

import numpy as np
import pytest

from whmr_tpu.utils.vis import (
    make_image_grid,
    vis_batch_image_with_joints,
    vis_img_2Djoint,
    vis_img_3Djoint,
    vis_smpl_iuv,
)


class TestJointGrids:
    def test_make_image_grid_tiles(self, rng):
        imgs = rng.rand(5, 16, 12, 3).astype(np.float32)
        grid = make_image_grid(imgs, nrow=3, padding=1)
        assert grid.shape == (2 * 17 + 1, 3 * 13 + 1, 3)
        # first tile content preserved (normalized)
        lo, hi = imgs.min(), imgs.max()
        np.testing.assert_allclose(
            grid[1:17, 1:13], (imgs[0] - lo) / (hi - lo), atol=1e-6
        )

    def test_batch_image_with_joints_draws(self, rng):
        imgs = rng.rand(4, 64, 48, 3).astype(np.float32)
        joints = np.stack(
            [np.stack([rng.uniform(5, 43, 10), rng.uniform(5, 59, 10)], -1)
             for _ in range(4)]
        )
        vis = np.ones((4, 10, 1))
        out = vis_batch_image_with_joints(imgs, joints, vis, nrow=2)
        base = (make_image_grid(imgs, nrow=2) * 255).astype(np.uint8)
        assert out.shape == base.shape
        assert out.dtype == np.uint8
        assert (out != base).any()  # something was drawn
        # invisible joints -> nothing drawn
        out_none = vis_batch_image_with_joints(imgs, joints, np.zeros((4, 10, 1)), nrow=2)
        np.testing.assert_array_equal(out_none, base)

    def test_2d_grid_renders_and_is_deterministic(self, rng):
        joints = rng.randn(3, 14, 2).astype(np.float32)
        imgs = rng.rand(3, 32, 32, 3).astype(np.float32)
        pairs = [(0, 1), (1, 2), (3, 4)]
        groups = [list(range(7)), list(range(7, 14))]
        a = vis_img_2Djoint(imgs, joints, pairs=pairs, joint_group=groups)
        b = vis_img_2Djoint(imgs, joints, pairs=pairs, joint_group=groups)
        assert a.ndim == 3 and a.shape[2] == 3 and a.dtype == np.uint8
        np.testing.assert_array_equal(a, b)  # png-diff determinism
        assert (a < 250).any()  # non-blank figure

    def test_3d_grid_renders(self, rng):
        joints = rng.randn(2, 24, 3).astype(np.float32)
        pairs = [(0, 1), (1, 4), (4, 7)]
        out = vis_img_3Djoint(None, joints, pairs=pairs)
        assert out.ndim == 3 and out.shape[2] == 3
        assert (out < 250).any()

    def test_2d_without_images_single_row(self, rng):
        out = vis_img_2Djoint(None, rng.randn(1, 14, 2).astype(np.float32))
        assert out.ndim == 3


class TestSmplIUVPanels:
    def test_panels_written_with_reference_naming(self, rng, tmp_path):
        from whmr_tpu.data.assets import synthetic_smpl_assets

        assets = synthetic_smpl_assets()
        b, h, w = 2, 64, 64
        images = rng.randint(0, 255, (b, h, w, 3)).astype(np.uint8)
        verts = np.tile(assets.v_template[None], (b, 1, 1)).astype(np.float32)
        cam_t = np.tile(np.array([[0.0, 0.0, 30.0]], np.float32), (b, 1))
        u = rng.rand(b, 16, 16, 25).astype(np.float32)
        v = rng.rand(b, 16, 16, 25).astype(np.float32)
        idx = rng.rand(b, 16, 16, 25).astype(np.float32)
        errors = np.array([12.34, 5.6])
        paths = vis_smpl_iuv(
            images, cam_t, verts, assets.faces, (u, v, idx), errors,
            ["img_a.png", "img_b.jpg"], str(tmp_path / "panels"),
            focal_length=500.0,
        )
        assert len(paths) == 2
        # reference naming: '{int(10*err):06d}_{stem}.png' (uv_vis.py:82-83)
        assert os.path.basename(paths[0]) == "000123_img_a.png"
        assert os.path.basename(paths[1]) == "000056_img_b.png"
        import cv2

        panel = cv2.imread(paths[0])
        assert panel is not None
        assert panel.shape == (h, 3 * w, 3)  # image | overlay | IUV

    def test_panels_without_uv(self, rng, tmp_path):
        from whmr_tpu.data.assets import synthetic_smpl_assets

        assets = synthetic_smpl_assets()
        images = rng.randint(0, 255, (1, 48, 48, 3)).astype(np.uint8)
        verts = assets.v_template[None].astype(np.float32)
        paths = vis_smpl_iuv(
            images, np.array([[0.0, 0.0, 30.0]], np.float32), verts,
            assets.faces, None, np.array([0.0]), ["x.png"],
            str(tmp_path / "p2"),
        )
        import cv2

        assert cv2.imread(paths[0]).shape == (48, 96, 3)
