"""Native overlay renderer tests: camera rotation + ground plane options
(reference utils/renderer_cam.py render_overlay_image/render_image_group)."""

import numpy as np
import pytest

from whmr_tpu.data.assets import synthetic_smpl_assets
from whmr_tpu.inference.renderer import (
    _rotmat_right_factor,
    render_overlay,
    render_side_view,
)


@pytest.fixture(scope="module")
def mesh():
    assets = synthetic_smpl_assets()
    verts = assets.v_template.astype(np.float32)
    return verts, assets.faces


def _rot_x(deg):
    a = np.deg2rad(deg)
    return np.array(
        [[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]],
        np.float32,
    )


class TestRotmatFactor:
    def test_identity_is_identity(self):
        np.testing.assert_allclose(_rotmat_right_factor(np.eye(3)), np.eye(3))

    def test_orthonormal(self):
        f = _rotmat_right_factor(_rot_x(17))
        np.testing.assert_allclose(f @ f.T, np.eye(3), atol=1e-6)


class TestSideView:
    def test_ground_plane_renders(self, mesh):
        verts, faces = mesh
        cam_t = np.array([0.0, 0.0, 5.0], np.float32)
        plain = render_side_view([verts], [cam_t], faces, 800.0, (240, 240))
        grounded = render_side_view(
            [verts], [cam_t], faces, 800.0, (240, 240), ground=True
        )
        # the checkerboard adds two shaded gray tones absent before
        assert (grounded != plain).any()
        flat = grounded.reshape(-1, 3)
        gray = flat[:, 0] == flat[:, 1]
        gray &= flat[:, 1] == flat[:, 2]
        gray &= flat[:, 0] < 250  # exclude white background
        tones = np.unique(flat[gray, 0])
        assert gray.sum() > 500 and len(tones) >= 2

    def test_rotmat_changes_view(self, mesh):
        verts, faces = mesh
        cam_t = np.array([0.0, 0.0, 5.0], np.float32)
        base = render_side_view([verts], [cam_t], faces, 800.0, (240, 240))
        rot = render_side_view(
            [verts], [cam_t], faces, 800.0, (240, 240), rotmat=_rot_x(30)
        )
        ident = render_side_view(
            [verts], [cam_t], faces, 800.0, (240, 240), rotmat=np.eye(3)
        )
        assert (base != rot).any()
        np.testing.assert_array_equal(base, ident)


class TestOverlayRotation:
    def test_identity_rotmat_matches_none(self, mesh):
        verts, faces = mesh
        img = np.full((240, 240, 3), 10, np.uint8)
        cam_t = np.array([0.0, 0.0, 5.0], np.float32)
        a = render_overlay(img, [verts], [cam_t], faces, [800.0])
        b = render_overlay(
            img, [verts], [cam_t], faces, [800.0], cam_rotmat=np.eye(3)
        )
        np.testing.assert_array_equal(a, b)

    def test_rotation_moves_mesh(self, mesh):
        verts, faces = mesh
        img = np.full((240, 240, 3), 10, np.uint8)
        cam_t = np.array([0.0, 0.0, 5.0], np.float32)
        a = render_overlay(img, [verts], [cam_t], faces, [800.0])
        b = render_overlay(
            img, [verts], [cam_t], faces, [800.0], cam_rotmat=_rot_x(25)
        )
        assert (a != b).any()
