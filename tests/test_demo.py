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

    def test_raw_uint8_crop_matches_training_loader(self):
        """The serving uint8 feed must carry the SAME pixel values the
        training loader produces for the same (center, scale): both warp
        the uint8 frame directly (npz_dataset.py crops in uint8; the
        reference quantizes via PIL uint8, imutils.crop:87). A drift back
        to f32-crop-then-truncate would skew serve vs train by rounding."""
        from whmr_tpu.data import augment as A

        cfg = tiny_config()
        img = np.random.RandomState(1).randint(0, 255, (480, 640, 3), np.uint8)
        det = Detection(320.0, 240.0, 300.0)
        batch = prepare_crop_batch(cfg, img, [det], max_people=1,
                                   raw_uint8=True)
        want = A.crop_image(
            img, np.array([det.cx, det.cy], np.float32),
            det.size / 200.0, cfg.img_res,
        )
        if cfg.pymaf.backbone == "vitpose":
            want = want[:, 32:-32]
        assert batch["x"].dtype == np.uint8
        np.testing.assert_array_equal(batch["x"][0], want)


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


def _three_person_image():
    """Synthetic scene: dark bg + 3 bright person-shaped blobs."""
    img = np.full((480, 640, 3), 30, np.uint8)
    for cx, h in ((120, 260), (320, 300), (520, 220)):
        w = int(h * 0.35)
        y0 = 240 - h // 2
        cv2.rectangle(img, (cx - w // 2, y0), (cx + w // 2, y0 + h), (200, 180, 160), -1)
        cv2.circle(img, (cx, y0 - 5), w // 3, (210, 190, 170), -1)  # head
    return img


class TestDetectors:
    def test_contour_detector_finds_three(self):
        from whmr_tpu.inference.detector import ContourPersonDetector

        dets = ContourPersonDetector()(_three_person_image())
        assert len(dets) == 3
        xs = sorted(d.cx for d in dets)
        np.testing.assert_allclose(xs, [120, 320, 520], atol=15)
        for d in dets:
            assert 150 < d.size < 400

    def test_contour_detector_inverted_contrast(self):
        from whmr_tpu.inference.detector import ContourPersonDetector

        img = 255 - _three_person_image()  # bright bg, dark subjects
        assert len(ContourPersonDetector()(img)) == 3

    def test_iuv_detector_interface(self, pipeline):
        from whmr_tpu.inference.detector import IUVProposalDetector, build_detector

        det = build_detector("iuv", pipeline=pipeline)
        assert isinstance(det, IUVProposalDetector)
        out = det(np.random.RandomState(0).randint(0, 255, (480, 640, 3), np.uint8))
        assert isinstance(out, list)  # random init: any count, no crash
        for d in out:
            assert 0 <= d.cx <= 640 and 0 <= d.cy <= 480

    def test_components_to_detections_scaling(self):
        """Mask-space components map back to frame coordinates."""
        from whmr_tpu.inference.detector import _components_to_detections

        mask = np.zeros((96, 128), bool)
        mask[20:60, 30:50] = True  # h=40, w=20 at center (40, 40)
        dets = _components_to_detections(
            mask, scale_x=5.0, scale_y=10.0, min_area_frac=0.001,
            max_area_frac=0.9, aspect_range=(0.5, 8.0), max_people=4,
        )
        assert len(dets) == 1
        d = dets[0]
        np.testing.assert_allclose([d.cx, d.cy], [39.5 * 5, 39.5 * 10], atol=6)
        np.testing.assert_allclose(d.size, 40 * 10 * 1.1, rtol=0.05)

    def test_nms_merges_duplicates(self):
        from whmr_tpu.inference.detector import _merge_overlapping

        dets = [
            Detection(100, 100, 200, 0.9),
            Detection(104, 98, 195, 0.5),  # near-duplicate
            Detection(400, 100, 200, 0.8),
        ]
        kept = _merge_overlapping(dets)
        assert len(kept) == 2
        assert kept[0].score == 0.9

    def test_build_detector_factory(self):
        from whmr_tpu.inference.detector import (
            ContourPersonDetector,
            build_detector,
        )

        assert isinstance(build_detector("contour"), ContourPersonDetector)
        with pytest.raises(ValueError):
            build_detector("file")  # needs bbox_file
        with pytest.raises(ValueError):
            build_detector("iuv")  # needs the pipeline

    def test_detector_kind_resolution(self):
        """Bundle mode must never select the IUV detector (it needs the
        live model's fg-mask pass), and --checkpoint alongside --bundle is
        rejected in build_pipeline; detector_kind covers the default and
        the explicit-iuv error."""
        import argparse

        from whmr_tpu.inference.demo_cli import detector_kind

        def ns(**kw):
            base = dict(detector=None, checkpoint=None, bundle=None)
            base.update(kw)
            return argparse.Namespace(**base)

        assert detector_kind(ns()) == "full"
        assert detector_kind(ns(checkpoint="ck")) == "iuv"
        # a bundle ignores the checkpoint default and stays on 'full'
        assert detector_kind(ns(checkpoint="ck", bundle="b")) == "full"
        assert detector_kind(ns(bundle="b", detector="contour")) == "contour"
        with pytest.raises(SystemExit, match="live model"):
            detector_kind(ns(bundle="b", detector="iuv"))


class TestMultiPersonDemo:
    def test_three_person_folder_run(self, pipeline, tmp_path):
        """Raw multi-person image -> 3 pkl entries + 3-mesh overlay with NO
        bbox file (the reference needs MPT YOLO here, tester.py:68-79)."""
        from whmr_tpu.inference.detector import ContourPersonDetector

        pipeline.detector = ContourPersonDetector()
        img_dir = tmp_path / "imgs"
        out_dir = tmp_path / "out"
        img_dir.mkdir()
        cv2.imwrite(str(img_dir / "three.png"), _three_person_image()[:, :, ::-1])
        stats = pipeline.run_folder(str(img_dir), str(out_dir), render=True)
        assert stats["people"] == 3
        with open(out_dir / "three.pkl", "rb") as f:
            data = pickle.load(f)
        assert data["n_people"] == 3
        assert data["verts"].shape == (3, 6890, 3)
        assert data["detections"].shape == (3, 5)  # cx, cy, size, score, track_id
        assert os.path.exists(out_dir / "three_overlay.png")
