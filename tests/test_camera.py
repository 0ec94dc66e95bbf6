"""Tests for whmr_tpu.ops.camera: projection invariants + translation LSQ."""

import pytest
import numpy as np
import jax.numpy as jnp

from whmr_tpu.config import FOCAL_LENGTH
from whmr_tpu.ops import camera as C

pytestmark = pytest.mark.smoke


class TestPerspectiveProjection:
    def test_manual_pinhole(self, rng):
        pts = rng.randn(4, 10, 3).astype(np.float32)
        pts[..., 2] += 5.0
        t = np.zeros((4, 3), np.float32)
        f = 1000.0
        center = np.tile(np.array([[320.0, 240.0]], np.float32), (4, 1))
        out = np.asarray(
            C.perspective_projection(jnp.asarray(pts), None, jnp.asarray(t), f, jnp.asarray(center))
        )
        expected = pts[..., :2] / pts[..., 2:3] * f + center[:, None, :]
        np.testing.assert_allclose(out, expected, rtol=1e-5)

    def test_per_sample_focal(self, rng):
        pts = rng.randn(3, 5, 3).astype(np.float32)
        pts[..., 2] += 5.0
        f = np.array([500.0, 1000.0, 1500.0], np.float32)
        center = np.zeros((3, 2), np.float32)
        out = np.asarray(
            C.perspective_projection(jnp.asarray(pts), None, None, jnp.asarray(f), jnp.asarray(center))
        )
        expected = pts[..., :2] / pts[..., 2:3] * f[:, None, None]
        np.testing.assert_allclose(out, expected, rtol=1e-5)

    def test_rotation_applied_first(self, rng):
        from scipy.spatial.transform import Rotation as ScipyRot

        pts = rng.randn(2, 6, 3).astype(np.float32)
        pts[..., 2] += 5.0
        rot = ScipyRot.random(2, random_state=rng).as_matrix().astype(np.float32)
        t = np.array([[0, 0, 10], [0, 0, 12]], np.float32)
        center = np.zeros((2, 2), np.float32)
        out = np.asarray(
            C.perspective_projection(
                jnp.asarray(pts), jnp.asarray(rot), jnp.asarray(t), 100.0, jnp.asarray(center)
            )
        )
        moved = np.einsum("bij,bkj->bki", rot, pts) + t[:, None, :]
        expected = moved[..., :2] / moved[..., 2:3] * 100.0
        np.testing.assert_allclose(out, expected, rtol=5e-3, atol=5e-3)


class TestWeakPerspective:
    def test_matches_reference_formula(self, rng):
        """geometry.py:289-307: cam [s,tx,ty] -> t=[tx,ty,2f/(H s)], norm by W/2,H/2."""
        joints = rng.randn(4, 49, 3).astype(np.float32)
        cam = np.abs(rng.randn(4, 3)).astype(np.float32) + 0.5
        out = np.asarray(C.weak_perspective_projection(jnp.asarray(joints), jnp.asarray(cam), (256, 256)))
        s = cam[:, 0]
        t = np.stack([cam[:, 1], cam[:, 2], 2 * FOCAL_LENGTH / (256 * s + 1e-9)], axis=-1)
        moved = joints + t[:, None, :]
        proj = moved[..., :2] / moved[..., 2:3] * FOCAL_LENGTH
        expected = proj / np.array([128.0, 128.0])
        np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-4)


class TestFullImgCam:
    def test_tz_form(self, rng):
        cam = np.abs(rng.randn(4, 3)).astype(np.float32) + 0.5
        h = np.full((4,), 200.0, np.float32)
        center = rng.uniform(100, 500, size=(4, 2)).astype(np.float32)
        tz = np.full((4,), 8.0, np.float32)
        out = np.asarray(
            C.convert_pare_to_full_img_cam(
                jnp.asarray(cam), jnp.asarray(h), jnp.asarray(center),
                jnp.asarray(np.full(4, 640.0)), jnp.asarray(np.full(4, 480.0)), tz=jnp.asarray(tz),
            )
        )
        np.testing.assert_allclose(out[:, 2], tz, rtol=1e-6)
        expected_x = cam[:, 1] + 2 * (center[:, 0] - 320.0) / (cam[:, 0] * h)
        np.testing.assert_allclose(out[:, 0], expected_x, rtol=1e-4)

    def test_focal_form_consistent_with_projection(self, rng):
        """With f given: tz = 2f/(h*s) — same depth as the weak-persp model."""
        cam = np.array([[1.2, 0.1, -0.2]], np.float32)
        h = np.array([300.0], np.float32)
        center = np.array([[320.0, 240.0]], np.float32)
        out = np.asarray(
            C.convert_pare_to_full_img_cam(
                jnp.asarray(cam), jnp.asarray(h), jnp.asarray(center),
                jnp.asarray([640.0]), jnp.asarray([480.0]), focal_length=jnp.asarray([1500.0]),
            )
        )
        np.testing.assert_allclose(out[0, 2], 2 * 1500.0 / (300.0 * 1.2), rtol=1e-5)


class TestEstimateTranslation:
    def test_recovers_known_translation(self, rng):
        """Project joints with a known t; the batched LSQ must recover t."""
        b, j = 6, 49
        joints = rng.randn(b, j, 3).astype(np.float32) * 0.3
        t_true = np.stack(
            [rng.uniform(-0.5, 0.5, b), rng.uniform(-0.5, 0.5, b), rng.uniform(4, 10, b)], axis=-1
        ).astype(np.float32)
        f, size = 5000.0, (224.0, 224.0)
        moved = joints + t_true[:, None, :]
        p2d = moved[..., :2] / moved[..., 2:3] * f + np.array(size) / 2.0
        kp = np.concatenate([p2d, np.ones((b, j, 1), np.float32)], axis=-1)
        t_est = np.asarray(
            C.estimate_translation(jnp.asarray(joints), jnp.asarray(kp), f, size)
        )
        np.testing.assert_allclose(t_est, t_true, rtol=1e-2, atol=5e-3)

    def test_confidence_weighting(self, rng):
        """Zero-confidence joints must not influence the fit."""
        b, j = 2, 49
        joints = rng.randn(b, j, 3).astype(np.float32) * 0.3
        t_true = np.array([[0.1, -0.2, 6.0], [0.0, 0.3, 8.0]], np.float32)
        f, size = 5000.0, (224.0, 224.0)
        moved = joints + t_true[:, None, :]
        p2d = moved[..., :2] / moved[..., 2:3] * f + np.array(size) / 2.0
        conf = np.ones((b, j, 1), np.float32)
        # corrupt half of the 2D points but zero their confidence
        p2d_bad = p2d.copy()
        p2d_bad[:, 30:40] += 500.0
        conf[:, 30:40] = 0.0
        kp = np.concatenate([p2d_bad, conf], axis=-1)
        t_est = np.asarray(C.estimate_translation(jnp.asarray(joints), jnp.asarray(kp), f, size))
        np.testing.assert_allclose(t_est, t_true, rtol=1e-2, atol=5e-3)


class TestSoftargmax:
    def test_peak_location(self):
        logits = np.full((3, 256), -10.0, np.float32)
        for i, p in enumerate([0, 128, 255]):
            logits[i, p] = 10.0
        out = np.asarray(C.softargmax_1d(jnp.asarray(logits)))
        expected = np.array([0, 128, 255]) / 255.0 * 2 - 1
        np.testing.assert_allclose(out, expected, atol=1e-3)

    def test_decode_ranges(self, rng):
        logits = rng.randn(4, 256).astype(np.float32)
        vfov, pitch, roll = C.decode_cam_angles(
            jnp.asarray(logits), jnp.asarray(logits), jnp.asarray(logits)
        )
        assert np.all((np.asarray(vfov) >= C.VFOV_RANGE[0]) & (np.asarray(vfov) <= C.VFOV_RANGE[1]))
        assert np.all(np.abs(np.asarray(pitch)) <= 0.6)
        assert np.all(np.abs(np.asarray(roll)) <= 0.6)
