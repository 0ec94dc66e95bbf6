"""Demo pipeline tests: detector -> crops -> forward -> pkl/overlay outputs."""

import os
import pickle

import cv2
import numpy as np
import pytest

from whmr_tpu.data.assets import synthetic_smpl_assets
from whmr_tpu.inference.pipeline import (
    DemoPipeline,
    Detection,
    FullImageDetector,
    prepare_crop_batch,
)
from whmr_tpu.utils.testing import tiny_config


@pytest.fixture(scope="module")
def pipeline():
    import jax
    import jax.numpy as jnp

    from whmr_tpu.models.regressor import body_consts_from_assets
    from whmr_tpu.models.whmr import WHMR
    from whmr_tpu.training.train_step import create_train_state
    from whmr_tpu.utils.testing import make_example_inputs

    cfg = tiny_config()
    assets = synthetic_smpl_assets()
    consts = body_consts_from_assets(assets)
    model = WHMR(cfg)
    example = make_example_inputs(cfg, 2)
    state = create_train_state(
        cfg, model, consts, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in example.items()},
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return DemoPipeline(cfg, variables, assets, max_people=4, use_camcalib=False)


class TestCropBatch:
    def test_padding_and_validity(self):
        cfg = tiny_config()
        img = np.random.RandomState(0).randint(0, 255, (480, 640, 3), np.uint8)
        dets = [Detection(320, 240, 300), Detection(100, 100, 150)]
        batch = prepare_crop_batch(cfg, img, dets, max_people=4)
        assert batch["x"].shape == (4, 256, 192, 3)
        np.testing.assert_array_equal(batch["valid"], [1, 1, 0, 0])
        assert batch["bbox_info"].shape == (4, 5)

    def test_full_image_detector(self):
        det = FullImageDetector()
        out = det(np.zeros((480, 640, 3), np.uint8))
        assert len(out) == 1 and out[0].size == 640


class TestPipeline:
    def test_run_image(self, pipeline):
        img = np.random.RandomState(1).randint(0, 255, (480, 640, 3), np.uint8)
        result = pipeline.run_image(img)
        assert result["n_people"] == 1
        assert result["verts"].shape == (1, 6890, 3)
        assert result["verts_world"].shape == (1, 6890, 3)
        assert result["global_pose"].shape == (1, 72)
        assert np.all(np.isfinite(result["verts"]))

    def test_run_folder_outputs(self, pipeline, tmp_path):
        img_dir = tmp_path / "imgs"
        out_dir = tmp_path / "out"
        img_dir.mkdir()
        rng = np.random.RandomState(2)
        for i in range(2):
            cv2.imwrite(str(img_dir / f"im{i}.png"), rng.randint(0, 255, (240, 320, 3), np.uint8))
        stats = pipeline.run_folder(str(img_dir), str(out_dir), render=True, save_obj_files=True)
        assert stats["images"] == 2
        files = sorted(os.listdir(out_dir))
        assert "im0.pkl" in files and "im0_overlay.png" in files and "im0.obj" in files
        with open(out_dir / "im0.pkl", "rb") as f:
            data = pickle.load(f)
        assert data["verts"].shape[0] == 1
        overlay = cv2.imread(str(out_dir / "im0_overlay.png"))
        assert overlay.shape[1] == 320 + 240 * 2  # image + two side panels
