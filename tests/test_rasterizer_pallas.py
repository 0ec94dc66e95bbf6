"""Pallas rasterizer kernel: parity vs the XLA scan rasterizer (interpret
mode on CPU; the compiled path is exercised on TPU by the training bench)."""

import numpy as np
import jax.numpy as jnp

from whmr_tpu.data.assets import synthetic_smpl_assets
from whmr_tpu.ops.rasterizer import project_weak_perspective_to_pixels, rasterize
from whmr_tpu.ops.rasterizer_pallas import rasterize_pallas, spatial_sort_faces


class TestPallasParity:
    def test_triangles_match_xla(self, rng):
        verts = jnp.asarray(rng.uniform(2, 30, size=(2, 12, 2)).astype(np.float32))
        z = jnp.asarray(rng.uniform(2, 8, size=(2, 12)).astype(np.float32))
        attrs = jnp.asarray(rng.rand(2, 12, 3).astype(np.float32))
        faces = rng.randint(0, 12, size=(6, 3)).astype(np.int32)
        ref = rasterize(verts, z, attrs, faces, resolution=(32, 32), chunk=4)
        out = rasterize_pallas(
            verts, z, attrs, faces, resolution=(32, 32), chunk=8, tile_p=256,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(out.mask), np.asarray(ref.mask))
        np.testing.assert_allclose(
            np.asarray(out.zbuf), np.asarray(ref.zbuf), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.attrs), np.asarray(ref.attrs), atol=1e-4
        )

    def test_smpl_mesh_matches_xla(self, rng):
        assets = synthetic_smpl_assets()
        verts = jnp.asarray(assets.v_template[None])
        cam = jnp.asarray([[0.9, 0.0, 0.0]])
        vp, vz = project_weak_perspective_to_pixels(verts, cam, (64, 64))
        attrs = jnp.asarray(np.tile(assets.v_template[None], (1, 1, 1)).astype(np.float32))
        ref = rasterize(vp, vz, attrs, assets.faces, resolution=(64, 64), chunk=2048)
        out = rasterize_pallas(
            vp, vz, attrs, assets.faces, resolution=(64, 64), chunk=512,
            tile_p=512, interpret=True,
        )
        # mask parity within a tiny boundary tolerance (argmin tie-breaks)
        agree = (np.asarray(out.mask) == np.asarray(ref.mask)).mean()
        assert agree > 0.999
        both = np.asarray(out.mask) & np.asarray(ref.mask)
        za = np.asarray(out.zbuf)[both]
        zb = np.asarray(ref.zbuf)[both]
        # fp32 accumulation-order differences sit at the ~1e-4 level, with
        # rare coincident-face tie swaps at silhouette boundaries; GT
        # supervision maps are insensitive at this scale.
        np.testing.assert_allclose(za, zb, rtol=5e-3)

    def test_cull_corner_mesh_matches_xla(self, rng):
        # Geometry confined to one image corner: most (tile, chunk) pairs
        # must be culled, and the result must still equal the XLA path
        # exactly (culling may only skip chunks that cover no pixel center).
        verts = jnp.asarray(rng.uniform(1, 7, size=(2, 24, 2)).astype(np.float32))
        z = jnp.asarray(rng.uniform(2, 8, size=(2, 24)).astype(np.float32))
        attrs = jnp.asarray(rng.rand(2, 24, 2).astype(np.float32))
        faces = rng.randint(0, 24, size=(20, 3)).astype(np.int32)
        ref = rasterize(verts, z, attrs, faces, resolution=(32, 32), chunk=4)
        out = rasterize_pallas(
            verts, z, attrs, faces, resolution=(32, 32), chunk=4, tile_p=64,
            tile_hw=(8, 8), interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(out.mask), np.asarray(ref.mask))
        np.testing.assert_allclose(np.asarray(out.zbuf), np.asarray(ref.zbuf), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out.attrs), np.asarray(ref.attrs), atol=1e-4)

    def test_window_origin_bit_exact(self, rng):
        """Rendering a window at `origin` must be BIT-identical to rendering
        the enclosing frame and slicing — both rasterizer paths. This is the
        correctness contract behind the 128x96 vitpose-slice render (which
        skips the 25% margin work; training/gt_renderer.render_gt_maps)."""
        verts = jnp.asarray(rng.uniform(2, 30, size=(2, 30, 2)).astype(np.float32))
        z = jnp.asarray(rng.uniform(2, 8, size=(2, 30)).astype(np.float32))
        attrs = jnp.asarray(rng.rand(2, 30, 3).astype(np.float32))
        faces = rng.randint(0, 30, size=(16, 3)).astype(np.int32)

        full = rasterize(verts, z, attrs, faces, resolution=(32, 32), chunk=4)
        win = rasterize(
            verts, z, attrs, faces, resolution=(32, 16), chunk=4,
            origin=(8.0, 0.0),
        )
        np.testing.assert_array_equal(
            np.asarray(win.zbuf), np.asarray(full.zbuf[:, :, 8:24])
        )
        np.testing.assert_array_equal(
            np.asarray(win.attrs), np.asarray(full.attrs[:, :, 8:24])
        )

        full_p = rasterize_pallas(
            verts, z, attrs, faces, resolution=(32, 32), chunk=8, tile_p=64,
            tile_hw=(8, 8), interpret=True,
        )
        win_p = rasterize_pallas(
            verts, z, attrs, faces, resolution=(32, 16), chunk=8, tile_p=64,
            tile_hw=(8, 8), origin=(8.0, 0.0), interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(win_p.zbuf), np.asarray(full_p.zbuf[:, :, 8:24])
        )
        np.testing.assert_array_equal(
            np.asarray(win_p.attrs), np.asarray(full_p.attrs[:, :, 8:24])
        )

    def test_spatial_sort_is_permutation(self):
        assets = synthetic_smpl_assets()
        faces = np.asarray(assets.faces)
        sorted_faces = spatial_sort_faces(faces, np.asarray(assets.v_template))
        assert sorted_faces.shape == faces.shape
        # Same multiset of triangles (row-wise).
        a = {tuple(r) for r in faces.tolist()}
        b = {tuple(r) for r in sorted_faces.tolist()}
        assert a == b
