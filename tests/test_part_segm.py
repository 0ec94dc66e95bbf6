"""Part-segmentation rendering/metrics + video helper tests."""

import os

import cv2
import numpy as np
import jax.numpy as jnp

from whmr_tpu.data.assets import synthetic_smpl_assets
from whmr_tpu.inference.part_segm import (
    render_part_segmentation,
    segmentation_metrics,
    vertex_part_labels,
)
from whmr_tpu.inference.video import images_to_video, video_to_images


class TestPartSegmentation:
    def test_vertex_labels_cover_parts(self):
        labels = vertex_part_labels(synthetic_smpl_assets())
        assert labels.min() >= 1 and labels.max() <= 6
        assert len(np.unique(labels)) >= 4

    def test_render_part_map(self):
        assets = synthetic_smpl_assets()
        verts = jnp.asarray(assets.v_template[None])
        cam = jnp.asarray([[0.9, 0.0, 0.0]])
        parts = np.asarray(render_part_segmentation(assets, verts, cam, (64, 64)))
        assert parts.shape == (1, 64, 64)
        assert parts.max() <= 6 and parts.min() >= 0
        assert (parts > 0).mean() > 0.03

    def test_metrics_perfect_and_disjoint(self, rng):
        gt = rng.randint(0, 7, (32, 32))
        m = segmentation_metrics(gt, gt)
        assert m["mask_accuracy"] == 1.0 and m["mask_f1"] == 1.0 and m["parts_accuracy"] == 1.0
        m2 = segmentation_metrics(np.zeros_like(gt), gt)
        assert m2["mask_f1"] == 0.0


class TestVideo:
    def test_roundtrip(self, tmp_path, rng):
        frames_dir = tmp_path / "frames"
        frames_dir.mkdir()
        paths = []
        for i in range(5):
            p = str(frames_dir / f"f{i}.png")
            cv2.imwrite(p, rng.randint(0, 255, (64, 80, 3), np.uint8))
            paths.append(p)
        video = images_to_video(paths, str(tmp_path / "out.mp4"), fps=10)
        assert os.path.getsize(video) > 0
        extracted = video_to_images(video, str(tmp_path / "back"))
        assert len(extracted) == 5
