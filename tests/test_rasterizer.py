"""Rasterizer correctness: known geometry, z-test, interpolation, mesh render."""

import numpy as np
import jax.numpy as jnp
import pytest

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


class TestGTCameraSanitization:
    """Degenerate estimate_translation outputs must not produce unbounded
    weak-persp cameras (VERDICT round-2 item 6: a bad LSQ solve defeats the
    tile culling and can 3x the GT render, or NaN-poison the maps)."""

    def test_nan_and_degenerate_tz_clamped(self):
        import jax.numpy as jnp
        import numpy as np

        from whmr_tpu.training.gt_renderer import gt_camera_from_cam_t

        cam_t = jnp.asarray([
            [0.0, 0.0, 8.7],        # healthy
            [0.0, 0.0, 1e-6],       # near-zero tz -> s would be ~7.8e6
            [0.0, 0.0, -5.0],       # behind the camera
            [np.nan, np.nan, np.nan],
            [300.0, -300.0, 1e12],  # absurd translation / far depth
        ])
        cam = np.asarray(gt_camera_from_cam_t(cam_t))
        assert np.isfinite(cam).all()
        s = cam[:, 0]
        assert (s <= 2 * 1000.0 / 256.0 + 1e-5).all()   # tz >= 1
        assert (s > 0).all()
        assert (np.abs(cam[:, 1:]) <= 20.0).all()
        # the healthy sample is untouched
        np.testing.assert_allclose(s[0], 2 * 1000.0 / (256.0 * 8.7), rtol=1e-6)
        np.testing.assert_allclose(cam[0, 1:], 0.0, atol=1e-7)
        # DEGENERATE samples must render SMALL (far default -> minimum
        # scale), never snap to the near bound's maximum scale: a finite
        # negative tz clipped to tz=1 would give s=7.8, a full-frame mesh
        # that defeats the rasterizer's chunk-bbox culling.
        s_far = 2 * 1000.0 / (256.0 * 100.0)
        np.testing.assert_allclose(s[1], s_far, rtol=1e-6)  # near-zero tz
        np.testing.assert_allclose(s[2], s_far, rtol=1e-6)  # behind camera
        np.testing.assert_allclose(s[3], s_far, rtol=1e-6)  # NaN
        np.testing.assert_allclose(s[4], s_far, rtol=1e-6)  # absurd far

    def test_degenerate_keypoints_end_to_end(self, rng):
        """Zero-confidence keypoints make the LSQ solve singular (NaN);
        the sanitized camera must still render finite, mostly-empty maps."""
        import jax.numpy as jnp
        import numpy as np

        from whmr_tpu.config import FOCAL_LENGTH
        from whmr_tpu.data.assets import synthetic_smpl_assets
        from whmr_tpu.models.smpl import smpl_forward, smpl_params_from_assets
        from whmr_tpu.ops.camera import estimate_translation
        from whmr_tpu.training.gt_renderer import (
            build_render_consts,
            gt_camera_from_cam_t,
            render_gt_maps,
        )

        assets = synthetic_smpl_assets()
        params = smpl_params_from_assets(assets)
        out = smpl_forward(
            params, jnp.zeros((2, 10)), jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3))
        )
        kp = jnp.zeros((2, 49, 3))  # conf 0 everywhere -> singular solve
        cam_t = estimate_translation(out.joints, kp, FOCAL_LENGTH, (256.0, 256.0))
        assert not np.isfinite(np.asarray(cam_t)).all()  # genuinely degenerate
        cam = gt_camera_from_cam_t(cam_t)
        maps = render_gt_maps(
            build_render_consts(assets), out.vertices, cam,
            heatmap_size=(32, 32), vitpose_slice=False, with_depth=True,
        )
        assert np.isfinite(np.asarray(maps["iuv_image_gt"])).all()
        assert np.isfinite(np.asarray(maps["depth_image_gt"])).all()


class TestSubMeshRender:
    """gt_render_mesh="sub": coarse GT render from the dmap0-pooled mesh."""

    @pytest.mark.smoke
    def test_sub_consts_topology(self):
        import numpy as np

        from whmr_tpu.data.assets import synthetic_smpl_assets
        from whmr_tpu.training.gt_renderer import build_render_consts

        assets = synthetic_smpl_assets()
        full = build_render_consts(assets)
        sub = build_render_consts(assets, mesh="sub")
        n_sub = assets.dmap0.shape[0]
        assert sub.source_verts == n_sub
        vm = np.asarray(sub.vertex_map)
        assert vm.min() >= 0 and vm.max() < n_sub
        assert sub.vertex_iuv.shape == (vm.shape[0], 3)
        f = np.asarray(sub.faces)
        assert f.shape[1] == 3 and f.shape[0] < full.faces.shape[0]
        assert f.min() >= 0 and f.max() < vm.shape[0]
        # no degenerate faces survive the collapse: corner POSITIONS (the
        # mapped sub verts) must be distinct, not just the render ids
        fs = vm[f]
        assert ((fs[:, 0] != fs[:, 1]) & (fs[:, 1] != fs[:, 2])
                & (fs[:, 0] != fs[:, 2])).all()
        # IUV value ranges preserved (parts 1..24 scaled by /24, UV in [0,1])
        iuv = np.asarray(sub.vertex_iuv)
        assert (iuv >= 0).all() and (iuv <= 1).all()
        with pytest.raises(ValueError):
            build_render_consts(assets, mesh="bogus")

    @pytest.mark.smoke
    def test_faces_are_part_pure(self):
        """Every face's three corners must carry the SAME part index (full
        AND sub charts). Barycentric interpolation of the part channel
        across a mixed-part face emits intermediate values that
        iuv_img2map rounds to unrelated part labels — the reference avoids
        this with the duplicated-vertex DensePose topology
        (renderer.py:302-328), and so must every chart here."""
        import numpy as np

        from whmr_tpu.data.assets import synthetic_smpl_assets
        from whmr_tpu.training.gt_renderer import build_render_consts

        assets = synthetic_smpl_assets()
        for mesh in ("full", "sub"):
            rc = build_render_consts(assets, mesh=mesh)
            part = np.round(np.asarray(rc.vertex_iuv)[:, 0] * 24.0)
            fp = part[np.asarray(rc.faces)]
            assert (fp[:, 0] == fp[:, 1]).all() and (fp[:, 1] == fp[:, 2]).all(), mesh
            # the chart still uses many parts (duplication didn't collapse it)
            assert len(np.unique(fp[:, 0])) > 4, mesh
            # and positions reach the render verts through vertex_map
            vm = np.asarray(rc.vertex_map)
            assert rc.vertex_iuv.shape[0] == vm.shape[0]
            assert vm.max() < rc.source_verts

    @pytest.mark.smoke
    def test_selection_matrix_dmap_no_spurious_fan(self):
        """The real mesh_downsampling.npz D is a binary SELECTION matrix —
        one nonzero per row, ~5100 of 6890 columns all-zero. A naive
        dmap0.argmax(axis=0) maps every unselected full vert to sub-vert 0,
        fanning ~2k spurious triangles from it (advisor round-3 high). The
        NN-based mapping must produce a balanced, bounded valence instead."""
        import dataclasses

        import numpy as np

        from whmr_tpu.data.assets import synthetic_smpl_assets
        from whmr_tpu.training.gt_renderer import build_render_consts

        base = synthetic_smpl_assets()
        n_sub, n_full = base.dmap0.shape
        sel = np.zeros((n_sub, n_full), np.float32)
        # Strided selection like the real asset: each row picks ONE vertex.
        picks = np.linspace(0, n_full - 1, n_sub).astype(int)
        sel[np.arange(n_sub), picks] = 1.0
        assets = dataclasses.replace(base, dmap0=sel)
        sub = build_render_consts(assets, mesh="sub")
        vm = np.asarray(sub.vertex_map)
        # render faces -> the sub VERTICES they draw from
        f = vm[np.asarray(sub.faces)]
        assert f.min() >= 0 and f.max() < n_sub
        # Valence of any single sub vertex stays in the normal mesh range;
        # the argmax bug gives sub-vert 0 a valence in the thousands.
        counts = np.bincount(f.reshape(-1), minlength=n_sub)
        assert counts.max() < 64, counts.max()
        # Coverage: the kept topology should still be a real surface, not
        # a fringe of survivors around one bad vertex.
        assert f.shape[0] > n_sub, f.shape

    @pytest.mark.smoke
    def test_sub_render_covers_full_silhouette(self):
        """The coarse render must put the body in the same place: compare
        foreground masks of sub vs full renders of the same posed body."""
        import jax.numpy as jnp
        import numpy as np

        from whmr_tpu.data.assets import synthetic_smpl_assets
        from whmr_tpu.models.smpl import smpl_forward, smpl_params_from_assets
        from whmr_tpu.training.gt_renderer import (
            build_render_consts,
            render_gt_maps,
        )

        assets = synthetic_smpl_assets()
        params = smpl_params_from_assets(assets)
        out = smpl_forward(
            params, jnp.zeros((2, 10)), jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3))
        )
        cam = jnp.asarray([[0.9, 0.02, -0.05], [1.1, -0.1, 0.1]], jnp.float32)
        gt_sub_verts = jnp.einsum(
            "sv,bvk->bsk", jnp.asarray(assets.dmap0), out.vertices
        )
        kw = dict(heatmap_size=(64, 64), vitpose_slice=False, with_depth=True)
        m_full = render_gt_maps(build_render_consts(assets), out.vertices, cam, **kw)
        m_sub = render_gt_maps(
            build_render_consts(assets, mesh="sub"), gt_sub_verts, cam, **kw
        )
        assert m_sub["iuv_image_gt"].shape == m_full["iuv_image_gt"].shape
        fg_full = np.asarray(m_full["iuv_image_gt"][..., 0] > 0)
        fg_sub = np.asarray(m_sub["iuv_image_gt"][..., 0] > 0)
        inter = (fg_full & fg_sub).sum()
        union = (fg_full | fg_sub).sum()
        assert union > 0 and inter / union > 0.5, inter / union
        assert np.isfinite(np.asarray(m_sub["depth_image_gt"])).all()
