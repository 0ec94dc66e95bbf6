"""Real-format asset loading paths, exercised with fabricated files.

These cover the code that otherwise only runs on the user's downloaded data
bundle (VERDICT weak item 6): the chumpy-free SMPL pkl unpickler
(assets.py:141-174), the full `load_smpl_assets` directory layout
(assets.py:177-225), and the DensePose UV_Processed.mat branch of
`build_render_consts` (gt_renderer.py:41-57).
"""

import os
import pickle

import numpy as np
import pytest

from whmr_tpu.data.assets import load_smpl_assets, synthetic_smpl_assets


class _FakeCh:
    """Pickles as chumpy.ch.Ch so the unpickler's shim path triggers."""

    pass


_FakeCh.__module__ = "chumpy.ch"
_FakeCh.__qualname__ = "Ch"
_FakeCh.__name__ = "Ch"

# pickle verifies the class module is importable at DUMP time; register a
# stand-in chumpy so the fixture can write chumpy-tagged pickles without the
# real package (which this environment deliberately lacks).
import sys
import types

_chumpy = types.ModuleType("chumpy")
_chumpy_ch = types.ModuleType("chumpy.ch")
_chumpy_ch.Ch = _FakeCh
_chumpy.ch = _chumpy_ch
sys.modules.setdefault("chumpy", _chumpy)
sys.modules.setdefault("chumpy.ch", _chumpy_ch)


def _chumpy_wrap(arr):
    obj = _FakeCh()
    obj.__dict__["x"] = np.asarray(arr)
    return obj


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    """A reference-layout data dir built from the synthetic asset bundle,
    stored in the ORIGINAL formats (chumpy pkl, sparse matrices, npz)."""
    import scipy.sparse

    src = synthetic_smpl_assets()
    root = tmp_path_factory.mktemp("data")
    (root / "smpl").mkdir()

    n_verts = src.v_template.shape[0]
    posedirs_orig = src.posedirs.T.reshape(n_verts, 3, 207)  # pkl layout
    pkl = {
        "v_template": _chumpy_wrap(src.v_template),
        "shapedirs": _chumpy_wrap(src.shapedirs),
        "posedirs": _chumpy_wrap(posedirs_orig),
        "J_regressor": scipy.sparse.csc_matrix(src.j_regressor),  # sparse!
        "weights": _chumpy_wrap(src.lbs_weights),
        "f": src.faces.astype(np.uint32),
        "kintree_table": np.stack([src.parents, np.arange(24)]),
    }
    with open(root / "smpl" / "SMPL_NEUTRAL.pkl", "wb") as f:
        pickle.dump(pkl, f)

    np.savez(
        root / "smpl_mean_params.npz",
        pose=src.mean_pose_rot6d.reshape(-1).astype(np.float64),
        shape=src.mean_shape.astype(np.float64),
        cam=src.mean_cam.astype(np.float64),
    )
    d_arr = np.empty(2, object)
    d_arr[0] = scipy.sparse.coo_matrix(src.dmap0)
    d_arr[1] = scipy.sparse.coo_matrix(src.dmap1)
    np.savez(
        root / "mesh_downsampling.npz",
        D=d_arr, A=np.empty(0, object), U=np.empty(0, object),
    )
    np.save(root / "smpl" / "smpl_ssm.npy", src.ssm.reshape(1, 1, -1))
    np.save(root / "J_regressor_h36m.npy", src.j_regressor_h36m)
    np.save(root / "J_regressor_extra.npy", src.j_regressor_extra)
    return root, src


class TestLoadSmplAssets:
    def test_roundtrip_matches_source(self, data_dir):
        root, src = data_dir
        loaded = load_smpl_assets(str(root))
        np.testing.assert_allclose(loaded.v_template, src.v_template, atol=1e-6)
        np.testing.assert_allclose(loaded.shapedirs, src.shapedirs, atol=1e-6)
        np.testing.assert_allclose(loaded.posedirs, src.posedirs, atol=1e-6)
        np.testing.assert_allclose(loaded.j_regressor, src.j_regressor, atol=1e-6)
        np.testing.assert_allclose(loaded.lbs_weights, src.lbs_weights, atol=1e-6)
        np.testing.assert_array_equal(loaded.faces, src.faces)
        np.testing.assert_allclose(loaded.dmap0, src.dmap0, atol=1e-6)
        np.testing.assert_allclose(loaded.dmap1, src.dmap1, atol=1e-6)
        np.testing.assert_array_equal(loaded.ssm, src.ssm)
        np.testing.assert_allclose(
            loaded.mean_pose_rot6d, src.mean_pose_rot6d, atol=1e-6
        )

    def test_loaded_assets_run_smpl_forward(self, data_dir):
        import jax.numpy as jnp

        from whmr_tpu.models.smpl import smpl_forward, smpl_params_from_assets

        root, _ = data_dir
        params = smpl_params_from_assets(load_smpl_assets(str(root)))
        betas = jnp.zeros((2, 10))
        rotmats = jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3))
        out = smpl_forward(params, betas, rotmats)
        assert np.isfinite(np.asarray(out.vertices)).all()
        assert out.joints.shape[1] == 49

    def test_get_assets_dispatch(self, data_dir):
        from whmr_tpu.data.assets import get_assets

        root, src = data_dir
        loaded = get_assets(str(root))
        np.testing.assert_allclose(loaded.v_template, src.v_template, atol=1e-6)


class TestDensePoseMat:
    def test_build_render_consts_from_mat(self, tmp_path):
        import scipy.io

        from whmr_tpu.training.gt_renderer import build_render_consts

        assets = synthetic_smpl_assets()
        v = assets.v_template.shape[0]
        rng = np.random.RandomState(0)
        # DensePose-style: 10 dp-verts mapped onto SMPL verts, 4 faces.
        # PART-PURE like the real chart (each dp vertex belongs to one
        # chart): faces draw corners within a per-part vertex group —
        # build_render_consts now REJECTS impure mats at load.
        n_dp, n_f = 10, 4
        all_vertices = rng.choice(v, n_dp, replace=False) + 1  # 1-based
        groups = [np.arange(1, 6), np.arange(6, 11)]           # 1-based dp ids
        group_part = rng.choice(np.arange(1, 25), 2, replace=False)
        faces = np.stack([
            rng.choice(groups[i % 2], 3, replace=False) for i in range(n_f)
        ])                                                     # 1-based
        part = np.array([group_part[i % 2] for i in range(n_f)])
        u = rng.uniform(0, 1, n_dp)
        vv = rng.uniform(0, 1, n_dp)
        mat = str(tmp_path / "UV_Processed.mat")
        scipy.io.savemat(
            mat,
            {
                "All_vertices": all_vertices.reshape(1, -1),
                "All_FaceIndices": part.reshape(-1, 1),
                "All_U_norm": u.reshape(-1, 1),
                "All_V_norm": vv.reshape(-1, 1),
                "All_Faces": faces,
            },
        )
        consts = build_render_consts(assets, densepose_mat=mat)
        iuv = np.asarray(consts.vertex_iuv)
        # The DensePose topology IS the render mesh (reference
        # renderer.py:302-328): one render vertex per dp sample, positions
        # gathered from SMPL verts through vertex_map.
        assert iuv.shape == (n_dp, 3)
        assert np.isfinite(iuv).all()
        np.testing.assert_array_equal(
            np.asarray(consts.vertex_map), all_vertices - 1
        )
        assert consts.source_verts == v
        # U/V ride each dp vertex directly (reference textures_vts)
        np.testing.assert_allclose(iuv[:, 1], u, atol=1e-6)
        np.testing.assert_allclose(iuv[:, 2], vv, atol=1e-6)
        # part = FIRST face containing the dp vertex (reference dp_vert_pid)
        for dp_v in range(n_dp):
            hits = [i for i in range(n_f) if dp_v in (faces[i] - 1)]
            want = part[hits[0]] / 24.0 if hits else 0.0
            np.testing.assert_allclose(iuv[dp_v, 0], want, atol=1e-6)
        # faces reference dp verts, KD-sorted row order: same face SET
        got = {tuple(sorted(f)) for f in np.asarray(consts.faces).tolist()}
        want_faces = {tuple(sorted(f)) for f in (faces - 1).tolist()}
        assert got == want_faces

    def test_impure_mat_rejected(self, tmp_path):
        """A .mat where one dp vertex is shared by faces of different
        parts violates the part-pure invariant (seam labels would blend);
        build_render_consts must refuse it at load, not degrade silently."""
        import scipy.io

        import pytest

        from whmr_tpu.training.gt_renderer import build_render_consts

        assets = synthetic_smpl_assets()
        mat = str(tmp_path / "bad.mat")
        scipy.io.savemat(mat, {
            "All_vertices": np.arange(1, 4).reshape(1, -1),
            "All_FaceIndices": np.array([[1], [9]]),
            "All_U_norm": np.zeros((3, 1)),
            "All_V_norm": np.zeros((3, 1)),
            # both faces share dp verts but carry different parts
            "All_Faces": np.array([[1, 2, 3], [1, 3, 2]]),
        })
        with pytest.raises(ValueError, match="part-pure"):
            build_render_consts(assets, densepose_mat=mat)
        with pytest.raises(FileNotFoundError):
            build_render_consts(
                assets, densepose_mat=str(tmp_path / "missing.mat")
            )
