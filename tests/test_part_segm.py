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

    def test_seam_face_never_paints_third_label(self):
        """A face whose corners carry NON-ADJACENT part labels (torso=2,
        right-leg=5) must only paint those labels: barycentric blending of
        the integer channel would round interior pixels to 3/4 (arms).
        Pins the one-hot+argmax formulation (round-5 fix)."""
        import dataclasses

        base = synthetic_smpl_assets()
        lbs = np.zeros_like(base.lbs_weights)
        # joint 0 -> part 2 (torso); joint 8 (R ankle) -> part 5 (R leg)
        lbs[0, 0] = 1.0
        lbs[1, 8] = 1.0
        lbs[2, 8] = 1.0
        vt = np.array(base.v_template)
        # one big triangle facing the camera, centered
        vt[0] = [-0.8, -0.8, 0.0]
        vt[1] = [0.8, -0.8, 0.0]
        vt[2] = [0.0, 0.9, 0.0]
        assets = dataclasses.replace(
            base,
            lbs_weights=lbs.astype(base.lbs_weights.dtype),
            v_template=vt.astype(base.v_template.dtype),
            faces=np.array([[0, 1, 2]], np.int32),
        )
        labels = vertex_part_labels(assets)
        assert set(labels[:3].tolist()) == {2, 5}
        verts = jnp.asarray(vt[None])
        cam = jnp.asarray([[1.0, 0.0, 0.0]])
        parts = np.asarray(render_part_segmentation(assets, verts, cam, (64, 64)))
        got = set(np.unique(parts).tolist())
        assert (parts > 0).mean() > 0.1  # the triangle actually rendered
        assert got <= {0, 2, 5}, got  # no third label from blending

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
