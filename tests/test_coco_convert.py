"""COCO label conversion + checkpoint merge-tree tests."""

import json

import numpy as np

from whmr_tpu.data.coco import coco_to_npz
from whmr_tpu.data.kp_formats import FORMATS
from whmr_tpu.utils.convert_cli import merge_trees


class TestCocoConversion:
    def test_converts_to_npz_schema(self, tmp_path, rng):
        kps = []
        for _ in range(17):
            kps.extend([float(rng.uniform(50, 400)), float(rng.uniform(50, 300)), 2])
        coco = {
            "images": [{"id": 1, "file_name": "a.jpg"}],
            "categories": [{"id": 1, "name": "person"}],
            "annotations": [
                {"id": 10, "image_id": 1, "category_id": 1,
                 "bbox": [100, 80, 120, 260], "keypoints": kps},
                # too few visible keypoints -> dropped
                {"id": 11, "image_id": 1, "category_id": 1,
                 "bbox": [0, 0, 50, 50],
                 "keypoints": [0, 0, 0] * 15 + [10, 10, 2, 20, 20, 2]},
            ],
        }
        ann = tmp_path / "ann.json"
        ann.write_text(json.dumps(coco))
        out = coco_to_npz(str(ann), str(tmp_path / "labels.npz"))
        assert len(out["imgname"]) == 1
        assert out["part"].shape == (1, 24, 3)
        np.testing.assert_allclose(out["center"][0], [160, 210])
        # nose isn't in the 24 GT joints; rankle is (index 0)
        gt_names = FORMATS["spin"][25:]
        assert out["part"][0, gt_names.index("rankle"), 2] == 1.0

    def test_loads_into_dataset(self, tmp_path, rng):
        import cv2

        from whmr_tpu.data.npz_dataset import NpzDataset
        from whmr_tpu.utils.testing import tiny_config

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        cv2.imwrite(str(img_dir / "a.jpg"), rng.randint(0, 255, (360, 480, 3), np.uint8))
        kps = []
        for _ in range(17):
            kps.extend([float(rng.uniform(50, 400)), float(rng.uniform(50, 300)), 2])
        coco = {
            "images": [{"id": 1, "file_name": "a.jpg"}],
            "categories": [{"id": 1, "name": "person"}],
            "annotations": [{"id": 10, "image_id": 1, "category_id": 1,
                             "bbox": [100, 80, 120, 260], "keypoints": kps}],
        }
        (tmp_path / "ann.json").write_text(json.dumps(coco))
        coco_to_npz(str(tmp_path / "ann.json"), str(tmp_path / "labels.npz"))
        ds = NpzDataset(tiny_config(), str(tmp_path / "labels.npz"), str(img_dir), is_train=False)
        item = ds[0]
        assert item["img"].shape == (256, 192, 3)
        assert item["has_smpl"] == 0.0


class TestMergeTrees:
    def test_merge_reports(self, rng):
        base = {"a": {"kernel": np.zeros((4, 5)), "bias": np.zeros(5)}, "b": {"w": np.zeros(3)}}
        update = {
            "a": {"kernel": np.ones((4, 5)), "bias": np.ones(7)},  # bias mismatched
            "c": {"w": np.ones(2)},  # extra
        }
        merged, rep = merge_trees(base, update)
        assert rep["matched"] == 1
        assert len(rep["mismatched"]) == 1 and "bias" in rep["mismatched"][0]
        assert len(rep["extra"]) == 1
        np.testing.assert_array_equal(merged["a"]["kernel"], 1.0)
        np.testing.assert_array_equal(merged["a"]["bias"], 0.0)  # kept base
