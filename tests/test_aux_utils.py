"""Tests for FitsDict, tracking/smoothing, vis utils, uncrop."""

import numpy as np

from whmr_tpu.data.augment import crop_image, uncrop_image
from whmr_tpu.data.fits_dict import FitsDict
from whmr_tpu.utils.tracking import (
    OneEuroFilter,
    get_smooth_bbox_params,
    kp_to_bbox_param,
)
from whmr_tpu.utils.vis import colormap_depth, draw_horizon_line, draw_skeleton


class TestFitsDict:
    def test_init_update_get_roundtrip(self, tmp_path, rng):
        fd = FitsDict(str(tmp_path), ["dsA"], {"dsA": 10})
        assert fd.get_valid_state(["dsA"], [3])[0] == 0
        pose = rng.randn(1, 72).astype(np.float32) * 0.3
        betas = rng.randn(1, 10).astype(np.float32)
        fd.update(["dsA"], [3], rot=[0.0], is_flipped=[False], pose=pose, betas=betas, valid=[1])
        got_pose, got_betas = fd.get(["dsA"], [3], rot=[0.0], is_flipped=[False])
        np.testing.assert_allclose(got_pose, pose, atol=1e-5)
        np.testing.assert_allclose(got_betas, betas, atol=1e-6)
        assert fd.get_valid_state(["dsA"], [3])[0] == 1

    def test_flip_equivariance(self, tmp_path, rng):
        """update with flipped=True then get with flipped=True round-trips."""
        fd = FitsDict(str(tmp_path), ["d"], {"d": 4})
        pose = rng.randn(1, 72).astype(np.float32) * 0.3
        fd.update(["d"], [0], rot=[0.0], is_flipped=[True], pose=pose,
                  betas=np.zeros((1, 10), np.float32), valid=[1])
        got, _ = fd.get(["d"], [0], rot=[0.0], is_flipped=[True])
        np.testing.assert_allclose(got, pose, atol=1e-5)

    def test_save(self, tmp_path, rng):
        fd = FitsDict(str(tmp_path), ["d"], {"d": 4})
        fd.save(str(tmp_path / "out"))
        assert (tmp_path / "out" / "d_fits.npy").exists()


class TestTracking:
    def test_bbox_param_height_normalization(self, rng):
        kp = np.zeros((10, 3))
        kp[:, 0] = np.linspace(100, 110, 10)
        kp[:, 1] = np.linspace(50, 200, 10)
        kp[:, 2] = 3.0
        p = kp_to_bbox_param(kp, vis_thresh=2)
        assert p is not None
        assert abs(p[1] - 125.0) < 1.0  # vertical center
        assert p[2] > 0

    def test_smooth_bbox_interpolates_gaps(self, rng):
        frames = []
        for i in range(20):
            if i in (7, 8):
                frames.append(None)  # missing detection
            else:
                kp = np.zeros((5, 3))
                kp[:, 0] = 100 + i
                kp[:, 1] = np.linspace(50, 180, 5)
                kp[:, 2] = 3.0
                frames.append(kp)
        params, start, end = get_smooth_bbox_params(frames)
        assert start == 0 and end == 20
        assert params.shape[0] == 20
        # x-centers smooth and monotone-ish
        assert np.all(np.diff(params[3:17, 0]) > 0)

    def test_one_euro_smooths(self, rng):
        f = OneEuroFilter(min_cutoff=0.5, freq=30.0)
        noisy = np.sin(np.linspace(0, 4, 100)) + rng.randn(100) * 0.3
        out = np.array([f(np.array([v]))[0] for v in noisy])
        assert np.var(np.diff(out)) < np.var(np.diff(noisy))


class TestVis:
    def test_draw_skeleton(self, rng):
        img = np.zeros((128, 128, 3), np.uint8)
        kp = np.concatenate(
            [rng.uniform(10, 118, (25, 2)), np.ones((25, 1))], axis=1
        )
        out = draw_skeleton(img, kp)
        assert out.sum() > 0

    def test_horizon_line(self):
        img = np.zeros((128, 128, 3), np.uint8)
        out = draw_horizon_line(img, pitch=0.1, roll=0.05, vfov=0.9)
        assert out.sum() > 0

    def test_colormap_depth(self, rng):
        d = rng.rand(32, 32).astype(np.float32)
        d[:8] = 0
        vis = colormap_depth(d, mask=d > 0)
        assert vis.shape == (32, 32, 3)
        assert vis[:8].sum() == 0


class TestUncrop:
    def test_roundtrip_iou(self):
        img = np.zeros((360, 480, 3), np.float32)
        img[100:200, 150:300] = 200
        c = np.array([225.0, 150.0])
        crop = crop_image(img, c, 1.0, (256, 256))
        back = uncrop_image(crop, c, 1.0, (360, 480))
        inter = ((back > 100) & (img > 100)).sum()
        union = ((back > 100) | (img > 100)).sum()
        assert inter / union > 0.95


class TestTracker:
    def test_stable_ids_across_frames(self):
        from whmr_tpu.utils.tracking import GreedyIoUTracker

        t = GreedyIoUTracker()
        f1 = np.array([[10, 10, 100, 200], [300, 50, 400, 260]], float)
        ids1 = t.update(f1)
        assert ids1 == [0, 1]
        # both move slightly -> same ids
        ids2 = t.update(f1 + 5.0)
        assert ids2 == ids1
        # one leaves, a new one enters far away
        f3 = np.array([[305, 60, 405, 270], [600, 60, 680, 250]], float)
        ids3 = t.update(f3)
        assert ids3[0] == ids1[1]
        assert ids3[1] == 2
