"""Direct unit tests for training/losses.py semantics."""

import pytest
import jax.numpy as jnp
import numpy as np

from whmr_tpu.training import losses as L

pytestmark = pytest.mark.smoke


class TestMaskedMean:
    def test_matches_boolean_indexing(self, rng):
        """_masked_mean == err[mask].mean() of the reference formulation."""
        err = rng.rand(6, 4, 3).astype(np.float32)
        mask = np.array([1, 0, 1, 1, 0, 1], np.float32)
        ours = float(L._masked_mean(jnp.asarray(err), jnp.asarray(mask)))
        ref = err[mask.astype(bool)].reshape(4, -1).mean(axis=1).mean()
        np.testing.assert_allclose(ours, ref, rtol=1e-6)

    def test_no_valid_samples_gives_zero(self, rng):
        err = rng.rand(4, 3).astype(np.float32)
        out = float(L._masked_mean(jnp.asarray(err), jnp.zeros(4)))
        assert out == 0.0


class TestKeypointLosses:
    def test_conf_weighting_slices(self, rng):
        """OpenPose joints (first 25) weight separately from GT joints
        (trainer.py:203-213)."""
        pred = jnp.zeros((1, 49, 2))
        gt = np.zeros((1, 49, 3), np.float32)
        gt[..., :2] = 1.0  # constant error of 1 everywhere
        gt[..., 2] = 1.0
        only_gt = float(L.keypoint_loss(pred, jnp.asarray(gt), 0.0, 1.0))
        only_op = float(L.keypoint_loss(pred, jnp.asarray(gt), 1.0, 0.0))
        both = float(L.keypoint_loss(pred, jnp.asarray(gt), 1.0, 1.0))
        np.testing.assert_allclose(only_gt + only_op, both, rtol=1e-6)
        np.testing.assert_allclose(only_gt / only_op, 24 / 25, rtol=1e-5)

    def test_3d_loss_pelvis_invariant(self, rng):
        """Both sets pelvis-centered -> adding global offsets changes nothing
        (trainer.py:217-234)."""
        pred = rng.randn(2, 49, 3).astype(np.float32)
        gt = np.concatenate(
            [rng.randn(2, 24, 3).astype(np.float32), np.ones((2, 24, 1), np.float32)], -1
        )
        has = jnp.ones(2)
        base = float(L.keypoint_3d_loss(jnp.asarray(pred), jnp.asarray(gt), has))
        pred_shift = pred + np.array([1.0, -2.0, 3.0], np.float32)
        gt_shift = gt.copy()
        gt_shift[..., :3] += np.array([5.0, 6.0, -7.0], np.float32)
        shifted = float(
            L.keypoint_3d_loss(jnp.asarray(pred_shift), jnp.asarray(gt_shift), has)
        )
        np.testing.assert_allclose(base, shifted, rtol=1e-3, atol=1e-5)


class TestSmplParamLoss:
    def test_zero_for_matching_pose(self, rng):
        pose = (rng.randn(2, 72) * 0.3).astype(np.float32)
        from whmr_tpu.ops.rotation import batch_rodrigues

        rotmat = batch_rodrigues(jnp.asarray(pose).reshape(-1, 3)).reshape(-1, 24, 3, 3)
        betas = rng.randn(2, 10).astype(np.float32)
        lp, lb = L.smpl_param_loss(
            rotmat, jnp.asarray(betas), jnp.asarray(pose), jnp.asarray(betas), jnp.ones(2)
        )
        assert float(lp) < 1e-9 and float(lb) < 1e-12


class TestIUVLosses:
    def test_perfect_prediction_low_ce(self, rng):
        b, hh, ww = 2, 8, 8
        idx = rng.randint(0, 25, (b, hh, ww))
        onehot = np.eye(25, dtype=np.float32)[idx]
        ann_idx = rng.randint(0, 15, (b, hh, ww))
        ann_onehot = np.eye(15, dtype=np.float32)[ann_idx]
        uv = rng.rand(b, hh, ww, 25).astype(np.float32)
        gt = {"u": uv, "v": uv, "index": onehot, "ann": ann_onehot}
        # logits strongly matching the one-hot targets
        lu, lv, lidx, lann = L.iuv_losses(
            jnp.asarray(uv), jnp.asarray(uv), jnp.asarray(onehot * 50),
            jnp.asarray(ann_onehot * 50),
            {k: jnp.asarray(v) for k, v in gt.items()},
            jnp.ones(b), point_regression_weight=0.125,
        )
        assert float(lidx) < 1e-3 and float(lann) < 1e-3
        assert float(lu) < 1e-6 and float(lv) < 1e-6  # exact U/V match

    def test_uv_denominator_is_full_batch(self, rng):
        """The reference captures `batch_size = index_pred.size(0)` BEFORE
        the has_iuv masking (trainer.py:256,282-283): the U/V sums divide
        by the FULL batch, so one valid sample among two contributes half
        of what it would alone — normalizing by the valid count instead
        would silently scale POINT_REGRESSION_WEIGHTS by the inverse
        valid fraction on mixed batches."""
        b, hh, ww = 2, 4, 4
        idx = rng.randint(1, 25, (b, hh, ww))  # all-foreground parts
        onehot = np.eye(25, dtype=np.float32)[idx]
        gt_u = (rng.rand(b, hh, ww, 25).astype(np.float32) * 0.4) * onehot
        ann = np.eye(15, dtype=np.float32)[np.zeros((b, hh, ww), int)]
        gt = {"u": gt_u, "v": gt_u, "index": onehot, "ann": ann}
        pred = gt_u + 0.5 * onehot  # |err|=0.5 at the gt channel per pixel
        has = jnp.asarray([1.0, 0.0])
        lu, lv, _, _ = L.iuv_losses(
            jnp.asarray(pred), jnp.asarray(pred), jnp.asarray(onehot * 50),
            jnp.asarray(ann * 50), {k: jnp.asarray(v) for k, v in gt.items()},
            has, point_regression_weight=1.0,
        )
        # valid sample: 16 px x huber(0.5) = 0.125 -> sum 2.0; / FULL batch 2
        np.testing.assert_allclose(float(lu), 1.0, rtol=1e-5)
        np.testing.assert_allclose(float(lv), 1.0, rtol=1e-5)

    def test_invalid_samples_zero(self, rng):
        b = 2
        zero = jnp.zeros((b, 4, 4, 25))
        ann = jnp.zeros((b, 4, 4, 15))
        gt = {"u": zero, "v": zero, "index": zero, "ann": ann}
        lu, lv, lidx, lann = L.iuv_losses(
            zero, zero, zero, ann, gt, jnp.zeros(b), 0.125
        )
        assert float(lidx) == 0.0 and float(lann) == 0.0


class TestVertexLoss:
    def test_l1_value(self, rng):
        pred = jnp.zeros((2, 10, 3))
        gt = jnp.full((2, 10, 3), 0.5)
        out = float(L.vertex_loss(pred, gt, jnp.ones(2)))
        np.testing.assert_allclose(out, 0.5, rtol=1e-6)
