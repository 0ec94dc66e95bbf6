"""COCO keypoint OKS-AP tests (VERDICT round-2 item 4).

Hand-computed protocol values (no pycocotools on this machine — the
cross-check runs when it is importable), plus the `whmr-eval --coco_ap`
CLI end-to-end. Reference counterpart: datasets/coco_keypoint_dataset.py:16
+ JointsDataset.py scoring via COCOeval(iouType='keypoints').
"""

import json
import os

import numpy as np
import pytest

from whmr_tpu.inference.coco_eval import (
    COCO_SIGMAS,
    compute_oks,
    evaluate_oks_ap,
    load_coco_gt,
    spin49_to_coco17,
)

K = 17


def _gt(kps_xy, area=1.0, labeled=None):
    """One gt person from (K, 2) keypoints."""
    v = np.ones((K, 1)) * 2.0
    if labeled is not None:
        v = np.asarray(labeled, np.float64).reshape(K, 1) * 2.0
    kps = np.concatenate([np.asarray(kps_xy, np.float64), v], axis=1)
    x0, y0 = kps_xy.min(0)
    x1, y1 = kps_xy.max(0)
    return {
        "kps": kps[None],
        "areas": np.array([area]),
        "bboxes": np.array([[x0, y0, x1 - x0 + 1, y1 - y0 + 1]]),
        "ignore": np.zeros(1),
    }


def _stack_gts(*gts):
    return {
        key: np.concatenate([g[key] for g in gts], axis=0)
        for key in ("kps", "areas", "bboxes", "ignore")
    }


def _rand_kps(rng, spread=50.0):
    return rng.uniform(100, 100 + spread, (K, 2))


class TestOKS:
    def test_exact_prediction_is_one(self, rng):
        kps = _rand_kps(rng)
        gt = _gt(kps)
        oks = compute_oks(gt["kps"], gt["areas"], kps[None], gt["bboxes"])
        np.testing.assert_allclose(oks, [[1.0]], atol=1e-12)

    def test_single_labeled_keypoint_matches_formula(self, rng):
        """With one labeled keypoint at displacement d:
        OKS = exp(-d^2 / (2 * area * (2*sigma_k)^2)) — the published formula."""
        kps = _rand_kps(rng)
        labeled = np.zeros(K)
        labeled[3] = 1  # left ear, sigma=0.035
        area = 0.9
        gt = _gt(kps, area=area, labeled=labeled)
        d = 0.05
        dt = kps.copy()
        dt[3, 0] += d
        oks = compute_oks(gt["kps"], gt["areas"], dt[None], gt["bboxes"])
        expected = np.exp(-(d**2) / (2.0 * area * (2.0 * COCO_SIGMAS[3]) ** 2))
        np.testing.assert_allclose(oks[0, 0], expected, rtol=1e-12)

    def test_unlabeled_gt_uses_bbox_tolerance(self, rng):
        """gt with zero labeled keypoints: dts inside the expanded bbox get
        OKS 1 (distance terms zero), far-away dts decay."""
        kps = _rand_kps(rng)
        gt = _gt(kps, labeled=np.zeros(K))
        inside = kps.mean(0, keepdims=True).repeat(K, 0)
        far = inside + 1e4
        oks = compute_oks(
            gt["kps"], gt["areas"], np.stack([inside, far]), gt["bboxes"]
        )
        assert oks[0, 0] == pytest.approx(1.0)
        assert oks[1, 0] < 1e-6

    def test_unlabeled_gt_window_matches_pycocotools(self):
        """The bbox-tolerance window is EXACTLY [x-w, x+2w] x [y-h, y+2h]
        (cocoeval.py computeOks k1==0: x0=bb[0]-bb[2], x1=bb[0]+2*bb[2]).
        A detection just outside that window must accrue distance; one just
        inside must not. Regression for a +-1-width-too-wide window that
        absorbed false positives near crowd gts."""
        bbox = np.array([[100.0, 200.0, 10.0, 20.0]])  # x, y, w, h
        gt_kps = np.zeros((1, K, 3))  # all unlabeled
        areas = np.array([4.0])
        just_in = np.full((K, 2), [100.0 - 10.0 + 0.5, 200.0 - 20.0 + 0.5])
        just_out = np.full((K, 2), [100.0 - 10.0 - 3.0, 200.0])
        oks = compute_oks(
            gt_kps, areas, np.stack([just_in, just_out]), bbox
        )
        assert oks[0, 0] == pytest.approx(1.0)
        # dx = 3 per keypoint -> e = 9 / (2s)^2 / area / 2 summed form
        expected = np.mean(
            np.exp(-(3.0**2) / (2.0 * COCO_SIGMAS) ** 2 / (areas[0] + np.spacing(1)) / 2.0)
        )
        np.testing.assert_allclose(oks[1, 0], expected, rtol=1e-12)
        # upper edge: inside at x+2w-eps, outside at x+2w+delta
        hi_in = np.full((K, 2), [100.0 + 20.0 - 0.5, 200.0 + 40.0 - 0.5])
        hi_out = np.full((K, 2), [100.0 + 20.0 + 3.0, 200.0])
        oks2 = compute_oks(gt_kps, areas, np.stack([hi_in, hi_out]), bbox)
        assert oks2[0, 0] == pytest.approx(1.0)
        np.testing.assert_allclose(oks2[1, 0], expected, rtol=1e-12)


class TestAP:
    def test_detection_on_gtless_image_is_false_positive(self, rng):
        """COCOeval counts detections on images without annotations as
        false positives; dropping them inflates AP. Two images: one perfect
        tp, one detection on an image with no gt entry -> precision halves
        at full recall, AP must be < 1."""
        kps = _rand_kps(rng)
        gts = {0: _gt(kps)}
        dts = {
            0: {"kps": kps[None], "scores": np.array([0.9])},
            1: {"kps": (kps + 500.0)[None], "scores": np.array([0.95])},
        }
        res = evaluate_oks_ap(gts, dts)
        assert res["AP"] < 1.0
        # without the stray detection AP is perfect
        res_clean = evaluate_oks_ap(gts, {0: dts[0]})
        assert res_clean["AP"] == pytest.approx(1.0)
        assert res["AP"] < res_clean["AP"]
    def test_perfect_detections(self, rng):
        gts, dts = {}, {}
        for img in range(3):
            kps = _rand_kps(rng)
            gts[img] = _gt(kps)
            dts[img] = {"kps": kps[None], "scores": np.array([0.9])}
        res = evaluate_oks_ap(gts, dts)
        assert res["AP"] == pytest.approx(1.0)
        assert res["AP50"] == pytest.approx(1.0)
        assert res["AR"] == pytest.approx(1.0)

    def test_threshold_counting(self, rng):
        """One labeled keypoint displaced so OKS ~= 0.71: the dt matches at
        thresholds .50-.70 (5 of 10) and is a false positive at the rest ->
        AP = 5/10 (per-threshold AP is 1 or 0 with a single gt/dt)."""
        kps = _rand_kps(rng)
        labeled = np.zeros(K)
        labeled[0] = 1  # nose, sigma 0.026
        area = 1.0
        target = 0.71
        d = float(np.sqrt(-np.log(target) * 2 * area * (2 * COCO_SIGMAS[0]) ** 2))
        dt = kps.copy()
        dt[0, 0] += d
        gts = {0: _gt(kps, area=area, labeled=labeled)}
        dts = {0: {"kps": dt[None], "scores": np.array([0.9])}}
        res = evaluate_oks_ap(gts, dts)
        assert res["AP"] == pytest.approx(0.5)
        assert res["AP50"] == pytest.approx(1.0)
        assert res["AP75"] == pytest.approx(0.0)
        assert res["AR"] == pytest.approx(0.5)

    def test_missed_person_recall(self, rng):
        """2 gts, 1 perfect dt: recall 0.5; precision 1 up to recall 0.5 ->
        AP = 51/101 (the 101-point interpolation includes recall=0)."""
        k1, k2 = _rand_kps(rng), _rand_kps(rng) + 500.0
        gts = {0: _stack_gts(_gt(k1), _gt(k2))}
        dts = {0: {"kps": k1[None], "scores": np.array([0.9])}}
        res = evaluate_oks_ap(gts, dts)
        assert res["AP"] == pytest.approx(51 / 101)
        assert res["AR"] == pytest.approx(0.5)

    def test_false_positive_ranks_below_true_positive(self, rng):
        """An extra junk detection with LOWER score doesn't reduce AP
        (precision at each recall level unaffected); with HIGHER score it
        does."""
        kps = _rand_kps(rng)
        junk = kps + 300.0
        gts = {0: _gt(kps)}
        low = {0: {"kps": np.stack([kps, junk]), "scores": np.array([0.9, 0.1])}}
        high = {0: {"kps": np.stack([kps, junk]), "scores": np.array([0.1, 0.9])}}
        assert evaluate_oks_ap(gts, low)["AP"] == pytest.approx(1.0)
        assert evaluate_oks_ap(gts, high)["AP"] == pytest.approx(0.5)

    def test_crowd_gt_is_ignored(self, rng):
        """A dt matching only an iscrowd gt is neither tp nor fp — and a
        crowd gt absorbs MULTIPLE detections (cocoeval.py rematch is
        gated on iscrowd)."""
        kps = _rand_kps(rng)
        crowd = _rand_kps(rng) + 500.0
        gt = _stack_gts(_gt(kps), _gt(crowd))
        gt["ignore"] = np.array([0.0, 1.0])
        gt["crowd"] = np.array([0.0, 1.0])
        gts = {0: gt}
        dts = {0: {"kps": np.stack([kps, crowd]), "scores": np.array([0.9, 0.8])}}
        res = evaluate_oks_ap(gts, dts)
        assert res["AP"] == pytest.approx(1.0)  # crowd match doesn't hurt
        # two MORE high-scoring dts on the crowd region: all rematch the
        # crowd gt, stay ignored, and AP is still perfect
        dts2 = {0: {"kps": np.stack([crowd, crowd, kps, crowd]),
                    "scores": np.array([0.99, 0.95, 0.9, 0.85])}}
        assert evaluate_oks_ap(gts, dts2)["AP"] == pytest.approx(1.0)

    def test_noncrowd_ignored_gt_absorbs_only_one_dt(self, rng):
        """An iscrowd=0 gt whose keypoints are all unlabeled is IGNORED but
        not a crowd region: exactly one detection may match it; further
        overlapping detections must fall through to the FP cumsum
        (cocoeval.py only allows rematching `if iscrowd[gind]`). With the
        two junk dts outscoring the true positive, AP must drop to 0.5 —
        an ignore-gated rematch would (wrongly) keep it at 1.0."""
        kps = _rand_kps(rng)
        unl = _rand_kps(rng) + 500.0
        gt = _stack_gts(_gt(kps), _gt(unl, labeled=np.zeros(K)))
        gts = {0: gt}
        dts = {0: {"kps": np.stack([unl, unl + 1.0, kps]),
                   "scores": np.array([0.9, 0.85, 0.8])}}
        res = evaluate_oks_ap(gts, dts)
        assert res["AP"] == pytest.approx(0.5)

    def test_pycocotools_crosscheck(self, rng):
        """Exact agreement with pycocotools when it is available."""
        pycoco = pytest.importorskip("pycocotools.coco")
        from pycocotools.cocoeval import COCOeval

        images, anns, dt_list = [], [], []
        ann_id = 1
        rng2 = np.random.RandomState(9)
        gts, dts = {}, {}
        for img in range(4):
            images.append({"id": img, "file_name": f"{img}.jpg",
                           "width": 1000, "height": 1000})
            n = rng2.randint(1, 3)
            g_kps, g_area, g_bb = [], [], []
            d_kps, d_sc = [], []
            for _ in range(n):
                kps = rng2.uniform(100, 900, (K, 2))
                area = float(rng2.uniform(0.5e4, 2e4))
                dt = kps + rng2.randn(K, 2) * np.sqrt(area) * 0.05
                v = np.full((K, 1), 2.0)
                anns.append({
                    "id": ann_id, "image_id": img, "category_id": 1,
                    "keypoints": np.concatenate([kps, v], 1).reshape(-1).tolist(),
                    "num_keypoints": K, "area": area, "iscrowd": 0,
                    "bbox": [float(kps[:, 0].min()), float(kps[:, 1].min()),
                             float(np.ptp(kps[:, 0])), float(np.ptp(kps[:, 1]))],
                })
                ann_id += 1
                score = float(rng2.uniform(0.3, 1.0))
                dt_list.append({
                    "image_id": img, "category_id": 1, "score": score,
                    "keypoints": np.concatenate(
                        [dt, np.ones((K, 1))], 1).reshape(-1).tolist(),
                })
                g_kps.append(np.concatenate([kps, v], 1))
                g_area.append(area)
                g_bb.append(anns[-1]["bbox"])
                d_kps.append(dt)
                d_sc.append(score)
            gts[img] = {"kps": np.stack(g_kps), "areas": np.asarray(g_area),
                        "bboxes": np.asarray(g_bb)}
            dts[img] = {"kps": np.stack(d_kps), "scores": np.asarray(d_sc)}

        import io
        import contextlib

        coco = pycoco.COCO()
        coco.dataset = {"images": images, "annotations": anns,
                        "categories": [{"id": 1, "name": "person"}]}
        with contextlib.redirect_stdout(io.StringIO()):
            coco.createIndex()
            cocoDt = coco.loadRes(dt_list)
            e = COCOeval(coco, cocoDt, iouType="keypoints")
            e.evaluate()
            e.accumulate()
            e.summarize()
        ours = evaluate_oks_ap(gts, dts)
        assert ours["AP"] == pytest.approx(e.stats[0], abs=1e-6)
        assert ours["AP50"] == pytest.approx(e.stats[1], abs=1e-6)


class TestJointMapping:
    def test_spin49_to_coco17_names(self, rng):
        kp49 = rng.randn(2, 49, 2).astype(np.float32)
        out, conf = spin49_to_coco17(kp49)
        assert out.shape == (2, 17, 2)
        from whmr_tpu.data.kp_formats import FORMATS

        # nose is SPIN joint 'nose' (index 44 in the spin format table)
        nose_idx = FORMATS["spin"].index("nose")
        np.testing.assert_allclose(out[:, 0], kp49[:, nose_idx])


class TestCLI:
    def test_coco_ap_mode_end_to_end(self, tmp_path, capsys):
        import cv2
        import jax
        import jax.numpy as jnp

        from whmr_tpu.data.assets import synthetic_smpl_assets
        from whmr_tpu.inference import eval_cli
        from whmr_tpu.models.regressor import body_consts_from_assets
        from whmr_tpu.models.whmr import WHMR
        from whmr_tpu.training.train_step import create_train_state
        from whmr_tpu.utils.checkpoint import CheckpointManager
        from whmr_tpu.utils.testing import make_example_inputs, tiny_config

        cfg = tiny_config()
        consts = body_consts_from_assets(synthetic_smpl_assets())
        model = WHMR(cfg)
        inputs = make_example_inputs(cfg, 2)
        state = create_train_state(
            cfg, model, consts, jax.random.PRNGKey(0),
            {k: jnp.asarray(v) for k, v in inputs.items()},
        )
        ckpt_dir = tmp_path / "ckpt"
        CheckpointManager(str(ckpt_dir)).save(
            1,
            {
                "params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats),
                "opt_state": jax.device_get(state.opt_state),
                "step": np.ones((), np.int32),
                "epoch": 0,
                "batch_idx": 0,
            },
        )

        img_dir = tmp_path / "images"
        img_dir.mkdir()
        rng = np.random.RandomState(0)
        n = 3
        names, images, annotations = [], [], []
        for i in range(n):
            name = f"c_{i:02d}.png"
            cv2.imwrite(
                str(img_dir / name), rng.randint(0, 255, (480, 640, 3), np.uint8)
            )
            names.append(name)
            images.append({"id": i, "file_name": name, "width": 640, "height": 480})
            kps = rng.uniform(200, 400, (K, 2))
            annotations.append({
                "id": i + 1, "image_id": i, "category_id": 1,
                "keypoints": np.concatenate(
                    [kps, np.full((K, 1), 2.0)], 1).reshape(-1).tolist(),
                "num_keypoints": K, "area": 1e4, "iscrowd": 0,
                "bbox": [200.0, 200.0, 200.0, 200.0],
            })
        gt_json = tmp_path / "person_keypoints.json"
        gt_json.write_text(json.dumps({
            "images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "person"}],
        }))
        np.savez(
            tmp_path / "labels.npz",
            imgname=np.array(names),
            center=np.full((n, 2), 300, np.float32),
            scale=np.full((n,), 1.2, np.float32),
            pose=(rng.randn(n, 72) * 0.2).astype(np.float32),
            shape=(rng.randn(n, 10) * 0.3).astype(np.float32),
            has_smpl=np.ones(n, np.float32),
        )

        eval_cli.main([
            "--checkpoint", str(ckpt_dir),
            "--dataset_npz", str(tmp_path / "labels.npz"),
            "--img_dir", str(img_dir),
            "--batch_size", "2",
            "--coco_ap", "--coco_gt", str(gt_json),
            "--misc",
            "pymaf.mlp_dim", "32,16,8,4",
            "deconv.num_filters", "32,32,32",
            "vit.embed_dim", "64", "vit.depth", "2", "vit.num_heads", "2",
            "vit.drop_path_rate", "0.0",
        ])
        out = capsys.readouterr().out
        assert "AP:" in out and "AR:" in out
        ap = float([l for l in out.splitlines() if l.startswith("AP:")][0].split()[1])
        assert 0.0 <= ap <= 1.0

    def test_load_coco_gt_roundtrip(self, tmp_path, rng):
        kps = _rand_kps(rng)
        gt_json = tmp_path / "gt.json"
        gt_json.write_text(json.dumps({
            "images": [{"id": 5, "file_name": "a.jpg"}],
            "annotations": [{
                "id": 1, "image_id": 5, "category_id": 1,
                "keypoints": np.concatenate(
                    [kps, np.full((K, 1), 2.0)], 1).reshape(-1).tolist(),
                "area": 123.0, "iscrowd": 0, "bbox": [0, 0, 10, 10],
            }],
            "categories": [{"id": 1, "name": "person"}],
        }))
        gts = load_coco_gt(str(gt_json))
        assert 5 in gts and gts[5]["kps"].shape == (1, K, 3)
        assert gts[5]["areas"][0] == 123.0
