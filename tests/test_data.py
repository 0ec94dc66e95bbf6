"""Data pipeline tests: crop math, flips, dataset fields, loader, mixture."""

import os

import cv2
import numpy as np
import pytest

from whmr_tpu.data import augment as A
from whmr_tpu.data.loader import BatchLoader
from whmr_tpu.data.npz_dataset import MixtureDataset, NpzDataset
from whmr_tpu.utils.testing import tiny_config


@pytest.fixture(scope="module")
def fake_dataset(tmp_path_factory):
    """Small on-disk dataset in the reference npz schema."""
    root = tmp_path_factory.mktemp("ds")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(3)
    n = 8
    names = []
    for i in range(n):
        img = rng.randint(0, 255, (360, 480, 3), np.uint8)
        name = f"im_{i:03d}.png"
        cv2.imwrite(str(img_dir / name), img)
        names.append(name)
    np.savez(
        root / "labels.npz",
        imgname=np.array(names),
        center=rng.uniform(150, 300, (n, 2)).astype(np.float32),
        scale=rng.uniform(0.8, 1.5, (n,)).astype(np.float32),
        pose=(rng.randn(n, 72) * 0.2).astype(np.float32),
        shape=(rng.randn(n, 10) * 0.3).astype(np.float32),
        has_smpl=np.ones(n, np.float32),
        S=np.concatenate([rng.randn(n, 24, 3) * 0.3, np.ones((n, 24, 1))], -1).astype(np.float32),
        part=np.concatenate([rng.uniform(100, 400, (n, 24, 2)), np.ones((n, 24, 1))], -1).astype(np.float32),
        openpose=np.zeros((n, 25, 3), np.float32),
    )
    return root


@pytest.mark.smoke
class TestCropMath:
    def test_crop_center_identity(self):
        """A landmark at the bbox center maps to the crop center."""
        center = np.array([200.0, 150.0])
        scale = 1.0
        res = (256, 256)
        out = A.transform_point([200 + 1, 150 + 1], center, scale, res)
        np.testing.assert_allclose(out, [129, 129], atol=1.0)

    def test_transform_invert_roundtrip(self):
        center = np.array([211.0, 147.0])
        p = A.transform_point([100, 80], center, 1.2, (256, 256))
        back = A.transform_point(p, center, 1.2, (256, 256), invert=1)
        np.testing.assert_allclose(back, [100, 80], atol=2.0)

    def test_crop_image_contains_marked_pixel(self):
        """Paint a block at the bbox center; crop must have it centered."""
        img = np.zeros((360, 480, 3), np.float32)
        img[148:153, 198:203] = 255.0
        crop = A.crop_image(img, np.array([200.0, 150.0]), 0.8, (256, 256))
        cy, cx = np.array(np.nonzero(crop[..., 0])).mean(axis=1)
        assert abs(cy - 128) < 6 and abs(cx - 128) < 6

    def test_rotation_moves_pixels(self):
        img = np.zeros((360, 480, 3), np.float32)
        img[100:105, 198:203] = 255.0  # above center
        c = np.array([200.0, 150.0])
        up = A.crop_image(img, c, 0.8, (256, 256), rot=0)
        rot = A.crop_image(img, c, 0.8, (256, 256), rot=90)
        y0 = np.array(np.nonzero(up[..., 0])).mean(axis=1)
        y1 = np.array(np.nonzero(rot[..., 0])).mean(axis=1)
        assert np.abs(y0 - y1).max() > 20  # block moved to the side


@pytest.mark.smoke
class TestColorJitter:
    def test_full_recipe_deterministic_and_includes_hue(self):
        """The reference's A.ColorJitter(brightness, contrast, p=0.2)
        leaves saturation=0.2 / hue=0.2 at their defaults — both must be
        part of the jitter. A pure-red image keeps G == B under any
        brightness/contrast/saturation combination (all blend toward
        gray), so a G != B pixel proves the hue shift is applied."""
        img = np.zeros((32, 32, 3), np.uint8)
        img[..., 0] = 200
        out = A.color_jitter(img, np.random.RandomState(0), p=1.0)
        assert out.shape == img.shape and out.dtype == img.dtype
        np.testing.assert_array_equal(
            out, A.color_jitter(img, np.random.RandomState(0), p=1.0)
        )
        assert any(
            (A.color_jitter(img, np.random.RandomState(s), p=1.0)[..., 1]
             != A.color_jitter(img, np.random.RandomState(s), p=1.0)[..., 2]
             ).any()
            for s in range(8)
        )

    def test_probability_gate(self):
        img = (np.arange(32 * 32 * 3, dtype=np.uint8) % 255).reshape(32, 32, 3)
        np.testing.assert_array_equal(
            A.color_jitter(img, np.random.RandomState(0), p=0.0), img
        )


@pytest.mark.smoke
class TestFlips:
    def test_flip_pose_involution(self, rng):
        pose = rng.randn(72).astype(np.float32)
        np.testing.assert_allclose(A.flip_pose(A.flip_pose(pose)), pose, atol=1e-6)

    def test_flip_kp_involution(self, rng):
        for n, is_smpl in [(24, False), (24, True), (49, False), (49, True)]:
            kp = rng.randn(n, 3).astype(np.float32)
            np.testing.assert_allclose(A.flip_kp(A.flip_kp(kp, is_smpl), is_smpl), kp, atol=1e-6)

    def test_rot_aa_matches_rotation(self, rng):
        from scipy.spatial.transform import Rotation as R

        aa = rng.randn(3).astype(np.float64) * 0.5
        out = A.rot_aa(aa, 30.0)
        rz = R.from_euler("z", -30, degrees=True).as_matrix()
        expected = R.from_matrix(rz @ R.from_rotvec(aa).as_matrix()).as_rotvec()
        np.testing.assert_allclose(out, expected, atol=1e-6)


class TestNpzDataset:
    def test_item_fields_eval_mode(self, fake_dataset):
        cfg = tiny_config()
        ds = NpzDataset(
            cfg, str(fake_dataset / "labels.npz"), str(fake_dataset / "images"),
            is_train=False,
        )
        item = ds[0]
        assert item["img"].shape == (256, 192, 3)  # vitpose slice
        assert item["keypoints"].shape == (49, 3)
        assert item["keypoints_world"].shape == (49, 3)
        assert item["pose"].shape == (72,)
        assert item["bbox_info"].shape == (5,)
        assert item["meta_mask"].shape == (431, 1)
        assert np.all(np.isfinite(item["img"]))
        # eval mode: no vertex masking
        assert item["meta_mask"].min() == 1.0

    def test_train_mode_augments(self, fake_dataset):
        cfg = tiny_config()
        ds = NpzDataset(
            cfg, str(fake_dataset / "labels.npz"), str(fake_dataset / "images"),
            is_train=True, seed=11,
        )
        a = ds[0]["img"]
        ds.set_epoch(1)
        b = ds[0]["img"]
        # augmentation draws are reproducible per (seed, epoch, index) and
        # vary across epochs
        assert np.abs(a - b).max() > 1e-3

    def test_no_aug_train_is_deterministic_and_cached(self, fake_dataset):
        cfg = tiny_config()
        mk = lambda **kw: NpzDataset(
            cfg, str(fake_dataset / "labels.npz"), str(fake_dataset / "images"),
            is_train=True, seed=11, **kw,
        )
        ds = mk(use_augmentation=False)
        a = ds[0]
        ds.set_epoch(3)  # aug off: epoch must not change the sample
        b = ds[0]
        np.testing.assert_array_equal(a["img"], b["img"])
        np.testing.assert_array_equal(a["pose"], b["pose"])
        assert a["is_flipped"] == 0.0 and a["rot_angle"] == 0.0
        # cache_images returns identical samples and actually memoizes
        dsc = mk(use_augmentation=False, cache_images=True)
        c0 = dsc[0]
        assert 0 in dsc._img_cache
        np.testing.assert_array_equal(c0["img"], a["img"])
        np.testing.assert_array_equal(dsc[0]["img"], a["img"])  # cache hit
        # cache with augmentation on still matches the uncached pipeline
        ds_aug, ds_aug_c = mk(), mk(cache_images=True)
        np.testing.assert_array_equal(ds_aug[1]["img"], ds_aug_c[1]["img"])

    def test_device_norm_feed_matches_host_norm(self, fake_dataset):
        """uint8 feed + in-graph normalize == the host f32 pipeline."""
        import jax.numpy as jnp

        from whmr_tpu.training.train_step import device_normalize

        cfg = tiny_config()
        mk = lambda **kw: NpzDataset(
            cfg, str(fake_dataset / "labels.npz"), str(fake_dataset / "images"),
            is_train=True, seed=7, **kw,
        )
        host = mk()[0]
        dev = mk(device_norm=True)[0]
        assert dev["img"].dtype == np.uint8
        assert dev["pixel_noise"].shape == (3,)
        got = np.asarray(
            device_normalize(
                jnp.asarray(dev["img"][None]), jnp.asarray(dev["pixel_noise"][None])
            )[0]
        )
        np.testing.assert_allclose(got, host["img"], rtol=0, atol=1e-6)
        # eval mode ignores the flag: downstream eval graphs expect f32
        ds_eval = NpzDataset(
            cfg, str(fake_dataset / "labels.npz"), str(fake_dataset / "images"),
            is_train=False, device_norm=True,
        )
        assert ds_eval.device_norm is False
        assert ds_eval[0]["img"].dtype == np.float32

    def test_keypoints_world_in_range(self, fake_dataset):
        cfg = tiny_config()
        ds = NpzDataset(
            cfg, str(fake_dataset / "labels.npz"), str(fake_dataset / "images"),
            is_train=False,
        )
        item = ds[1]
        kpw = item["keypoints_world"]
        assert np.abs(kpw[:, :2]).max() < 3.0


class TestLoader:
    def test_batches(self, fake_dataset):
        cfg = tiny_config()
        ds = NpzDataset(
            cfg, str(fake_dataset / "labels.npz"), str(fake_dataset / "images"),
            is_train=False,
        )
        loader = BatchLoader(ds, batch_size=4, num_workers=3, shuffle=True)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0]["img"].shape == (4, 256, 192, 3)

    def test_process_workers_match_threads_exactly(self, fake_dataset):
        """Fork-based worker processes must yield bit-identical batches in
        the same order as thread workers: every sample draws from its own
        per-(seed, epoch, index) rng stream and collation restores index
        order, so the worker transport cannot change the data."""
        cfg = tiny_config()
        ds = NpzDataset(
            cfg, str(fake_dataset / "labels.npz"), str(fake_dataset / "images"),
            is_train=True,
        )
        lt = BatchLoader(ds, batch_size=4, num_workers=3, shuffle=True, seed=5)
        lp = BatchLoader(ds, batch_size=4, num_procs=2, shuffle=True, seed=5)
        lt.set_epoch(1)
        lp.set_epoch(1)
        bt, bp = list(lt), list(lp)
        assert len(bt) == len(bp) and len(bt) > 0
        for a, b in zip(bt, bp):
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    def test_process_worker_error_surfaces(self, fake_dataset):
        """An exception inside a worker process reaches the consumer."""
        cfg = tiny_config()
        ds = NpzDataset(
            cfg, str(fake_dataset / "labels.npz"), str(fake_dataset / "images"),
            is_train=False,
        )

        class Broken:
            def __len__(self):
                return len(ds)

            def __getitem__(self, i):
                if i == 3:
                    raise ValueError("boom")
                return ds[i]

        loader = BatchLoader(Broken(), batch_size=4, num_procs=2, shuffle=False)
        with pytest.raises(RuntimeError, match="dataset\\[3\\]"):
            list(loader)

    def test_process_worker_death_raises_not_hangs(self, fake_dataset):
        """A worker killed by the OS (OOM/segfault stand-in: SIGKILL from
        inside __getitem__) must surface as RuntimeError in the consumer,
        not hang the epoch forever (round-3 review finding; torch
        DataLoader guards this with a SIGCHLD watchdog)."""
        import os
        import signal

        cfg = tiny_config()
        ds = NpzDataset(
            cfg, str(fake_dataset / "labels.npz"), str(fake_dataset / "images"),
            is_train=False,
        )

        class Killer:
            def __len__(self):
                return len(ds)

            def __getitem__(self, i):
                if i == 3:
                    os.kill(os.getpid(), signal.SIGKILL)
                return ds[i]

        loader = BatchLoader(Killer(), batch_size=4, num_procs=2, shuffle=False)
        with pytest.raises(RuntimeError, match="died|missing"):
            list(loader)

    def test_host_sharding_disjoint(self, fake_dataset):
        cfg = tiny_config()
        ds = NpzDataset(
            cfg, str(fake_dataset / "labels.npz"), str(fake_dataset / "images"),
            is_train=False,
        )
        l0 = BatchLoader(ds, 2, shuffle=False, num_hosts=2, host_index=0)
        l1 = BatchLoader(ds, 2, shuffle=False, num_hosts=2, host_index=1)
        i0 = set(l0._epoch_indices().tolist())
        i1 = set(l1._epoch_indices().tolist())
        assert not (i0 & i1)
        assert len(i0 | i1) == len(ds)

    def test_set_epoch_reshuffles(self, fake_dataset):
        cfg = tiny_config()
        ds = NpzDataset(
            cfg, str(fake_dataset / "labels.npz"), str(fake_dataset / "images"),
            is_train=False,
        )
        loader = BatchLoader(ds, 2, shuffle=True)
        loader.set_epoch(0)
        a = loader._epoch_indices().tolist()
        loader.set_epoch(1)
        b = loader._epoch_indices().tolist()
        assert a != b


class TestMixture:
    def test_ratio_partition(self, fake_dataset):
        cfg = tiny_config()
        mk = lambda name: NpzDataset(
            cfg, str(fake_dataset / "labels.npz"), str(fake_dataset / "images"),
            name=name, is_train=False,
        )
        mix = MixtureDataset([mk("a"), mk("b")], weights=[0.75, 0.25], length=100)
        # indices below 75% of length hit dataset a, above hit b
        assert mix[0] is not None
        picks = [int(np.searchsorted(mix.partition, i / 100, side="right")) for i in range(100)]
        assert picks.count(0) == 75 and picks.count(1) == 25

    def test_duplicate_draws_get_fresh_augmentation(self, fake_dataset):
        """Sampling WITH replacement: two mixture indices that land on the
        same inner sample must draw different augmentation (the reference's
        shared np.random stream gives every draw fresh randomness); and the
        whole thing stays deterministic per (seed, epoch, mixture index)."""
        cfg = tiny_config()
        from whmr_tpu.data.npz_dataset import _derived_rng

        ds = NpzDataset(
            cfg, str(fake_dataset / "labels.npz"), str(fake_dataset / "images"),
            name="a", is_train=True,
        )
        mix = MixtureDataset([ds], length=64, seed=0)
        # find two mixture indices that draw the SAME inner sample
        inner = [
            _derived_rng(0, 0, i).randint(len(ds)) for i in range(64)
        ]
        dup = next(
            (i, j)
            for i in range(64)
            for j in range(i + 1, 64)
            if inner[i] == inner[j]
        )
        a, b = mix[dup[0]], mix[dup[1]]
        assert not np.array_equal(a["img"], b["img"]), (
            "duplicate draws of one sample produced bit-identical augmentation"
        )
        # determinism: re-reading gives the same bits
        np.testing.assert_array_equal(a["img"], mix[dup[0]]["img"])
        np.testing.assert_array_equal(b["img"], mix[dup[1]]["img"])


class TestPipelineHardening:
    def test_missing_image_substitutes_neighbor(self, fake_dataset, tmp_path):
        """A corrupt/missing file must not kill the epoch: the dataset warns
        and substitutes the next sample (reference merely logs then crashes,
        base_dataset.py:270-277)."""
        import shutil

        root = tmp_path / "broken"
        shutil.copytree(fake_dataset, root)
        os.remove(root / "images" / "im_002.png")
        cfg = tiny_config()
        ds = NpzDataset(cfg, str(root / "labels.npz"), str(root / "images"),
                        is_train=True)
        item = ds[2]  # falls through to index 3
        assert item["sample_index"] == 3
        # loader survives a full epoch containing the bad sample
        loader = BatchLoader(ds, batch_size=4, num_workers=2, shuffle=False)
        batches = list(loader)
        assert len(batches) == 2
        # EVAL mode must NOT substitute: a silently duplicated neighbor
        # would skew benchmark metrics — fail loudly instead.
        ds_eval = NpzDataset(cfg, str(root / "labels.npz"), str(root / "images"),
                             is_train=False)
        with pytest.raises(FileNotFoundError):
            ds_eval[2]

    def test_set_start_batch_skips_at_index_level(self, fake_dataset):
        """Mid-epoch resume skip: the loader drops the first N batches from
        the work list BEFORE loading (no decode for skipped samples), and
        the remaining batches equal the tail of a full epoch."""
        cfg = tiny_config()
        ds = NpzDataset(cfg, str(fake_dataset / "labels.npz"),
                        str(fake_dataset / "images"), is_train=True)
        full = list(BatchLoader(ds, batch_size=2, shuffle=False, num_workers=1))
        loader = BatchLoader(ds, batch_size=2, shuffle=False, num_workers=1)
        loader.set_start_batch(2)
        tail = list(loader)
        assert len(tail) == len(full) - 2
        np.testing.assert_array_equal(
            tail[0]["sample_index"], full[2]["sample_index"]
        )
        # single-use: the next iteration is a full epoch again
        assert len(list(loader)) == len(full)

    def test_deterministic_epoch_repeat(self, fake_dataset):
        """Same (seed, epoch, index) -> bit-identical augmented sample, even
        across loader worker threading; new epoch -> fresh draws."""
        cfg = tiny_config()
        ds = NpzDataset(cfg, str(fake_dataset / "labels.npz"),
                        str(fake_dataset / "images"), is_train=True)
        a = ds[1]
        b = ds[1]
        np.testing.assert_array_equal(a["img"], b["img"])
        np.testing.assert_array_equal(a["meta_mask"], b["meta_mask"])
        ds.set_epoch(1)
        c = ds[1]
        assert not np.array_equal(a["img"], c["img"])

        ds.set_epoch(0)
        loader = BatchLoader(ds, batch_size=4, num_workers=4, shuffle=True)
        loader.set_epoch(0)
        run1 = [b["img"].copy() for b in loader]
        loader2 = BatchLoader(ds, batch_size=4, num_workers=2, shuffle=True)
        loader2.set_epoch(0)
        run2 = [b["img"].copy() for b in loader2]
        for x, y in zip(run1, run2):
            np.testing.assert_array_equal(x, y)

    def test_crop_failure_retries_original_bbox(self, fake_dataset):
        """An out-of-range augmented bbox retries with the original
        (reference base_dataset.py:281-287)."""
        cfg = tiny_config()
        ds = NpzDataset(cfg, str(fake_dataset / "labels.npz"),
                        str(fake_dataset / "images"), is_train=True)
        # Poison one sample's scale so the augmented crop degenerates.
        ds.scale = ds.scale.copy()
        ds.scale[0] = 1e-9
        item = ds[0]  # must not raise
        assert np.isfinite(item["img"]).all()

    def test_partial_final_batch_no_deadlock(self, fake_dataset):
        """drop_last=False with n % batch_size != 0 must yield a short final
        batch instead of blocking forever (regression: AGORA driver hang)."""
        cfg = tiny_config()
        ds = NpzDataset(cfg, str(fake_dataset / "labels.npz"),
                        str(fake_dataset / "images"), is_train=False)
        loader = BatchLoader(ds, batch_size=3, shuffle=False,
                             drop_last=False, num_workers=2)
        sizes = [b["img"].shape[0] for b in loader]
        assert sizes == [3, 3, 2]  # 8 samples
