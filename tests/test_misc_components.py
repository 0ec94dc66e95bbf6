"""Tests for kp format registry, HMR baseline, AGORA export."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whmr_tpu.data.kp_formats import FORMATS, convert_kps, get_perm_idxs


@pytest.mark.smoke
class TestKpFormats:
    def test_coco_to_common(self, rng):
        kp = rng.randn(2, 17, 3).astype(np.float32)
        out = convert_kps(kp, "coco", "common")
        assert out.shape == (2, 14, 3)
        # 'rankle' is coco idx 16, common idx 0
        np.testing.assert_array_equal(out[:, 0], kp[:, 16])
        # 'headtop' not in coco -> zeros
        np.testing.assert_array_equal(out[:, 13], 0)

    def test_spin_roundtrip_names(self):
        assert len(FORMATS["spin"]) == 49
        assert len(FORMATS["common"]) == 14
        # spin GT slice starts at 25 with 'rankle'
        assert FORMATS["spin"][25] == "rankle"

    def test_all_formats_resolve(self, rng):
        kp = rng.randn(1, len(FORMATS["spin"]), 3)
        for fmt in FORMATS:
            out = convert_kps(kp, "spin", fmt)
            assert out.shape[1] == len(FORMATS[fmt])

    def test_perm_idxs(self):
        idxs = get_perm_idxs("h36m", "common")
        assert all(0 <= i < 17 for i in idxs)


class TestHMRBaseline:
    def test_forward_shapes(self, rng):
        from whmr_tpu.data.assets import synthetic_smpl_assets
        from whmr_tpu.models.hmr import HMR
        from whmr_tpu.models.regressor import body_consts_from_assets

        consts = body_consts_from_assets(synthetic_smpl_assets())
        model = HMR()
        x = jnp.asarray(rng.randn(2, 224, 224, 3).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), consts, x)
        rotmat, betas, cam = model.apply(params, consts, x)
        assert rotmat.shape == (2, 24, 3, 3)
        assert betas.shape == (2, 10)
        assert cam.shape == (2, 3)
        # rot6d -> valid rotations
        r = np.asarray(rotmat).reshape(-1, 3, 3)
        np.testing.assert_allclose(
            r @ r.transpose(0, 2, 1), np.broadcast_to(np.eye(3), r.shape), atol=1e-4
        )


class TestAgoraExport:
    def test_export_person(self, tmp_path, rng):
        from whmr_tpu.inference.agora import export_person

        path = export_person(
            str(tmp_path), "image_001.png", 1,
            verts=rng.randn(6890, 3).astype(np.float32) * 0.3,
            smpl_joints3d=rng.randn(24, 3).astype(np.float32) * 0.3,
            pred_cam=np.array([1.1, 0.05, -0.1], np.float32),
            bbox_height=250.0,
            bbox_center=np.array([640.0, 360.0], np.float32),
            focal_length=1450.0,
        )
        assert os.path.basename(path) == "image_001_personId_1.pkl"
        with open(path, "rb") as f:
            data = pickle.load(f)
        # payload parity with val_results.py:144-155
        assert data["joints"].shape == (24, 2)
        assert data["verts"].shape == (6890, 3)
        assert data["allSmplJoints3d"].shape == (24, 3)
        # joints are in the upscaled 3840x2160 frame
        assert np.abs(data["joints"]).max() < 3840 * 2

    def test_val_mode_filename_munge(self):
        """val-mode drops the 3rd-from-last underscore part
        (val_results.py:104-108)."""
        from whmr_tpu.inference.agora import result_filename

        assert (
            result_filename("ag_cam00_00001_1280x720.png", 2, mode="val")
            == "ag_cam00_00001_personId_2.pkl"
        )
        # underscore-poor stems keep their stem instead of collapsing every
        # image onto the colliding 'personId_<k>.pkl'
        assert result_filename("img.png", 1, mode="val") == "img_personId_1.pkl"
        assert (
            result_filename("ag_cam00_00001_1280x720.png", 2, mode="test")
            == "ag_cam00_00001_1280x720_personId_2.pkl"
        )
