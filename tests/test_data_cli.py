"""whmr-data CLI: npz schema validation + coco conversion entry."""

import numpy as np
import pytest

from whmr_tpu.data.data_cli import check_npz, main


def good_npz(path, n=8, **extra):
    rng = np.random.RandomState(0)
    fields = dict(
        imgname=np.array([f"im_{i}.png" for i in range(n)]),
        center=rng.uniform(100, 300, (n, 2)).astype(np.float32),
        scale=rng.uniform(0.8, 1.5, (n,)).astype(np.float32),
        pose=(rng.randn(n, 72) * 0.2).astype(np.float32),
        shape=(rng.randn(n, 10) * 0.3).astype(np.float32),
        has_smpl=np.ones(n, np.float32),
        part=np.concatenate(
            [rng.uniform(0, 400, (n, 24, 2)), np.ones((n, 24, 1))], -1
        ).astype(np.float32),
    )
    fields.update(extra)
    np.savez(path, **fields)
    return path


@pytest.mark.smoke
class TestCheck:
    def test_valid_file_passes(self, tmp_path):
        p = good_npz(tmp_path / "ok.npz")
        errors, warnings = check_npz(str(p), train=True)
        assert errors == []

    def test_missing_required_and_bad_shape(self, tmp_path):
        rng = np.random.RandomState(0)
        np.savez(tmp_path / "bad.npz",
                 imgname=np.array(["a.png", "b.png"]),
                 center=rng.randn(2, 3).astype(np.float32))  # wrong tail
        errors, _ = check_npz(str(tmp_path / "bad.npz"))
        assert any("'scale'" in e for e in errors)
        assert any("center" in e and "shape" in e for e in errors)

    def test_value_checks(self, tmp_path):
        n = 4
        p = good_npz(
            tmp_path / "vals.npz", n=n,
            scale=np.zeros(n, np.float32),              # not positive
            has_smpl=np.full(n, 0.5, np.float32),       # not binary
            part=np.concatenate(
                [np.zeros((n, 24, 2)), np.full((n, 24, 1), 2.0)], -1
            ).astype(np.float32),                       # conf > 1
            cam_rotmat=np.zeros((n, 3, 3), np.float32),  # not orthonormal
        )
        errors, _ = check_npz(str(p))
        text = "\n".join(errors)
        assert "scale" in text and "has_smpl" in text
        assert "part" in text and "cam_rotmat" in text

    def test_nan_detected_and_unknown_warns(self, tmp_path):
        n = 4
        pose = (np.random.RandomState(1).randn(n, 72)).astype(np.float32)
        pose[1, 3] = np.nan
        p = good_npz(tmp_path / "nan.npz", n=n, pose=pose,
                     mystery=np.zeros(n, np.float32))
        errors, warnings = check_npz(str(p), train=True)
        assert any("pose" in e and "non-finite" in e for e in errors)
        assert any("mystery" in w for w in warnings)

    def test_img_dir_check(self, tmp_path):
        import cv2

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        n = 4
        for i in range(n - 1):  # one image deliberately missing
            cv2.imwrite(str(img_dir / f"im_{i}.png"),
                        np.zeros((32, 32, 3), np.uint8))
        p = good_npz(tmp_path / "imgs.npz", n=n)
        errors, _ = check_npz(str(p), img_dir=str(img_dir), sample=0)
        assert any("missing" in e for e in errors)

    def test_cli_exit_codes(self, tmp_path):
        p = good_npz(tmp_path / "ok.npz")
        with pytest.raises(SystemExit) as e:
            main(["check", str(p)])
        assert e.value.code == 0
        np.savez(tmp_path / "bad.npz", imgname=np.array(["x.png"]))
        with pytest.raises(SystemExit) as e:
            main(["check", str(tmp_path / "bad.npz")])
        assert e.value.code == 1

    def test_validated_file_actually_loads(self, tmp_path):
        """The contract: check says OK -> NpzDataset can consume it."""
        from whmr_tpu.data.npz_dataset import NpzDataset
        from whmr_tpu.utils.testing import tiny_config

        import cv2

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        n = 4
        for i in range(n):
            cv2.imwrite(str(img_dir / f"im_{i}.png"),
                        np.random.RandomState(i).randint(
                            0, 255, (240, 320, 3)).astype(np.uint8))
        p = good_npz(tmp_path / "ok.npz", n=n)
        errors, _ = check_npz(str(p), img_dir=str(img_dir), train=True)
        assert errors == []
        ds = NpzDataset(tiny_config(), str(p), str(img_dir), is_train=True)
        item = ds[0]
        assert np.isfinite(item["img"]).all()


@pytest.mark.smoke
class TestEmptyFile:
    def test_zero_sample_file_is_invalid_not_crash(self, tmp_path):
        np.savez(tmp_path / "empty.npz",
                 imgname=np.array([], dtype=str),
                 center=np.zeros((0, 2), np.float32),
                 scale=np.zeros((0,), np.float32),
                 part=np.zeros((0, 24, 3), np.float32),
                 cam_rotmat=np.zeros((0, 3, 3), np.float32))
        errors, _ = check_npz(str(tmp_path / "empty.npz"))
        assert any("0 samples" in e for e in errors)


class TestTCMRConvert:
    """`whmr-data tcmr`: TCMR/VIBE db -> npz schema (reference
    ThreeDPW_dataset.py:16-57)."""

    def _dict_db(self, tmp_path, n=6):
        import joblib

        rng = np.random.RandomState(0)
        db = {
            "img_name": np.array([f"courtyard/image_{i:05d}.jpg" for i in range(n)]),
            "bbox": np.concatenate(
                [rng.uniform(100, 400, (n, 2)), rng.uniform(80, 260, (n, 2))], 1
            ).astype(np.float32),
            "pose": (rng.randn(n, 72) * 0.2).astype(np.float32),
            "shape": (rng.randn(n, 10) * 0.2).astype(np.float32),
            "joints2D": np.concatenate(
                [rng.uniform(0, 400, (n, 49, 2)), rng.uniform(0, 1, (n, 49, 1))],
                -1,
            ).astype(np.float32),
            "joints3D": (rng.randn(n, 49, 3) * 0.3).astype(np.float32),
            "vid_name": np.array(["courtyard_arguing_00"] * n),
            "frame_id": np.arange(n),
            "valid": np.ones(n, np.float32),
        }
        path = tmp_path / "3dpw_test_db.pt"
        joblib.dump(db, path)
        return str(path), db

    def test_dict_flavor_roundtrip(self, tmp_path):
        from whmr_tpu.data.tcmr import tcmr_to_npz

        db_path, db = self._dict_db(tmp_path)
        out_npz = str(tmp_path / "labels.npz")
        out = tcmr_to_npz(db_path, out_npz)
        loaded = dict(np.load(out_npz, allow_pickle=True))
        assert loaded["imgname"].shape == (6,)
        np.testing.assert_allclose(loaded["center"], db["bbox"][:, :2])
        np.testing.assert_allclose(
            loaded["scale"], db["bbox"][:, 2:].max(1) / 200.0
        )
        # SPIN 49 split: openpose rows :25, part rows 25:
        np.testing.assert_allclose(loaded["openpose"], db["joints2D"][:, :25])
        np.testing.assert_allclose(loaded["part"], db["joints2D"][:, 25:])
        assert loaded["S"].shape == (6, 24, 4)
        np.testing.assert_allclose(loaded["S"][..., :3], db["joints3D"][:, 25:])
        assert "vid_name" in loaded and "frame_id" in loaded

    def test_conf_free_joints_get_zero_conf_for_zero_filled_rows(self, tmp_path):
        """(N, K, 2)-shaped joints2D / (N, 24, 3) joints3D carry no conf
        column; the fabricated conf must be 0 exactly on zero-filled rows
        (the OpenPose missing-joint convention) — conf-1.0 there would
        train predicted joints toward pixel (0,0) for every occluded
        joint (regression)."""
        import joblib

        from whmr_tpu.data.tcmr import tcmr_to_npz

        rng = np.random.RandomState(2)
        n = 4
        j2d = rng.uniform(10, 400, (n, 49, 2)).astype(np.float32)
        j2d[:, 3] = 0.0          # an undetected openpose joint, all frames
        j2d[1, 30] = 0.0         # a missing GT joint, one frame
        j3d = (rng.randn(n, 24, 3) * 0.3).astype(np.float32)
        j3d[2, 5] = 0.0
        db = {
            "img_name": np.array([f"im_{i}.jpg" for i in range(n)]),
            "bbox": np.tile(
                np.array([[200.0, 200.0, 100.0, 150.0]], np.float32), (n, 1)
            ),
            "joints2D": j2d,
            "joints3D": j3d,
        }
        path = tmp_path / "db.pt"
        joblib.dump(db, path)
        out = tcmr_to_npz(str(path), str(tmp_path / "o.npz"))
        assert out["openpose"].shape == (n, 25, 3)
        assert (out["openpose"][:, 3, 2] == 0).all()
        assert out["openpose"][:, 4, 2].min() == 1.0
        assert out["part"][1, 5, 2] == 0.0          # 49-row 30 -> part row 5
        assert out["part"][0, 5, 2] == 1.0
        assert out["S"][2, 5, 3] == 0.0
        assert out["S"][2, 6, 3] == 1.0

    def test_dict_flavor_validates_and_loads(self, tmp_path):
        """The converted file passes `whmr-data check --train` and feeds
        NpzDataset end-to-end (eval mode; images synthesized to match)."""
        import cv2

        from whmr_tpu.data.data_cli import check_npz, main
        from whmr_tpu.data.npz_dataset import NpzDataset
        from whmr_tpu.utils.testing import tiny_config

        db_path, db = self._dict_db(tmp_path)
        img_dir = tmp_path / "imgs"
        (img_dir / "courtyard").mkdir(parents=True)
        for name in db["img_name"]:
            cv2.imwrite(
                str(img_dir / str(name)),
                np.random.RandomState(1).randint(0, 255, (480, 640, 3), np.uint8),
            )
        out_npz = str(tmp_path / "labels.npz")
        main(["tcmr", db_path, out_npz])
        errors, _ = check_npz(out_npz, img_dir=str(img_dir), train=True)
        assert not errors, errors
        ds = NpzDataset(tiny_config(), out_npz, str(img_dir), is_train=False)
        item = ds[0]
        assert np.isfinite(item["img"]).all()

    def test_path_list_flavor(self, tmp_path):
        import cv2
        import joblib

        from whmr_tpu.data.tcmr import tcmr_to_npz

        img_dir = tmp_path / "frames"
        img_dir.mkdir()
        paths = []
        for i in range(3):
            name = f"f_{i}.png"
            cv2.imwrite(str(img_dir / name),
                        np.zeros((360, 480, 3), np.uint8))
            paths.append(f"/some/abs/root/{name}")
        db_path = str(tmp_path / "db.pt")
        joblib.dump(paths, db_path)
        out = tcmr_to_npz(db_path, str(tmp_path / "o.npz"),
                          img_dir=str(img_dir))
        # reference convention: center = img center, scale = max(h,w)/200
        np.testing.assert_allclose(out["center"][0], [240, 180])
        np.testing.assert_allclose(out["scale"], 480 / 200.0)

    def test_path_list_without_images_fails_clearly(self, tmp_path):
        import joblib
        import pytest

        from whmr_tpu.data.tcmr import tcmr_to_npz

        db_path = str(tmp_path / "db.pt")
        joblib.dump(["/nonexistent/a.png"], db_path)
        with pytest.raises(FileNotFoundError):
            tcmr_to_npz(db_path, str(tmp_path / "o.npz"))
