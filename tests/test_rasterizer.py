"""Rasterizer correctness: known geometry, z-test, interpolation, mesh render."""

import numpy as np
import jax.numpy as jnp

from whmr_tpu.data.assets import synthetic_smpl_assets
from whmr_tpu.ops.rasterizer import (
    project_weak_perspective_to_pixels,
    rasterize,
)


class TestTriangles:
    def test_single_triangle_coverage(self):
        """A triangle covering the left half-diagonal of a 32x32 image."""
        verts = jnp.asarray([[[0.0, 0.0], [32.0, 0.0], [0.0, 32.0]]])
        z = jnp.ones((1, 3))
        attrs = jnp.ones((1, 3, 1))
        faces = np.asarray([[0, 1, 2]], np.int32)
        out = rasterize(verts, z, attrs, faces, resolution=(32, 32), chunk=4)
        mask = np.asarray(out.mask[0])
        # pixel centers below the diagonal x+y<32 are inside
        assert mask[0, 0] and mask[15, 10]
        assert not mask[31, 31] and not mask[20, 20]
        cov = mask.mean()
        assert 0.45 < cov < 0.55

    def test_depth_test_nearer_wins(self):
        """Two overlapping triangles; the nearer one's attribute shows."""
        verts = jnp.asarray(
            [[[0, 0], [32, 0], [0, 32], [0, 0], [32, 0], [0, 32]]], jnp.float32
        )
        z = jnp.asarray([[5.0, 5.0, 5.0, 2.0, 2.0, 2.0]])
        attrs = jnp.asarray([[[1.0], [1.0], [1.0], [2.0], [2.0], [2.0]]])
        faces = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
        out = rasterize(verts, z, attrs, faces, resolution=(32, 32), chunk=2)
        assert np.allclose(np.asarray(out.attrs[0, 5, 5, 0]), 2.0)
        assert np.allclose(np.asarray(out.zbuf[0, 5, 5]), 2.0)

    def test_barycentric_interpolation(self):
        """Attribute varies linearly across the triangle."""
        verts = jnp.asarray([[[0.0, 0.0], [32.0, 0.0], [0.0, 32.0]]])
        z = jnp.ones((1, 3))
        attrs = jnp.asarray([[[0.0], [1.0], [0.0]]])  # ramp along x
        faces = np.asarray([[0, 1, 2]], np.int32)
        out = rasterize(verts, z, attrs, faces, resolution=(32, 32), chunk=1)
        a = np.asarray(out.attrs[0])
        # At pixel (y=0 row, x) attr ~ (x+0.5)/32
        row = a[0, :16, 0]
        expected = (np.arange(16) + 0.5) / 32.0
        np.testing.assert_allclose(row, expected, atol=1e-5)

    def test_winding_insensitive(self):
        """Both triangle orientations rasterize (sign-normalized areas)."""
        verts = jnp.asarray([[[0.0, 0.0], [32.0, 0.0], [0.0, 32.0]]])
        z = jnp.ones((1, 3))
        attrs = jnp.ones((1, 3, 1))
        fwd = rasterize(verts, z, attrs, np.asarray([[0, 1, 2]], np.int32), resolution=(16, 16), chunk=1)
        rev = rasterize(verts, z, attrs, np.asarray([[0, 2, 1]], np.int32), resolution=(16, 16), chunk=1)
        np.testing.assert_array_equal(np.asarray(fwd.mask), np.asarray(rev.mask))


class TestMeshRender:
    def test_smpl_mesh_silhouette(self):
        """Render the synthetic SMPL body; silhouette must be substantial,
        centered, and depth-ordered."""
        assets = synthetic_smpl_assets()
        verts = jnp.asarray(assets.v_template[None])
        cam = jnp.asarray([[0.9, 0.0, 0.0]])
        vp, vz = project_weak_perspective_to_pixels(verts, cam, (64, 64))
        attrs = jnp.ones((1, verts.shape[1], 1))
        out = rasterize(vp, vz, attrs, assets.faces, resolution=(64, 64), chunk=2048)
        mask = np.asarray(out.mask[0])
        assert 0.05 < mask.mean() < 0.9
        # body is roughly centered horizontally
        cols = mask.any(axis=0).nonzero()[0]
        assert cols.min() < 32 < cols.max()
        zb = np.asarray(out.zbuf[0])
        fg = zb[mask]
        assert np.all(fg > 0) and np.all(fg < 100)
