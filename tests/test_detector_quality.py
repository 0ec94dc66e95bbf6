"""Detector quality gates on composited synthetic frames (VERDICT r3
item 5): the contour backend must find rendered people on its design
domain (high-contrast synthetic scenes) with measurable recall/IoU.
Numbers at scale: scripts/bench_detector.py; recorded in PARITY.md."""

import numpy as np
import pytest

from whmr_tpu.inference.detector import ContourPersonDetector
from whmr_tpu.inference.detector_eval import (
    _square_iou,
    composite_frames,
    score_detector,
)
from whmr_tpu.inference.pipeline import Detection


class TestSquareIoU:
    def test_identity(self):
        d = Detection(10.0, 10.0, 8.0, 1.0)
        assert _square_iou(d, d) == pytest.approx(1.0)

    def test_disjoint(self):
        a = Detection(0.0, 0.0, 4.0, 1.0)
        b = Detection(100.0, 0.0, 4.0, 1.0)
        assert _square_iou(a, b) == 0.0

    def test_half_shift(self):
        a = Detection(0.0, 0.0, 10.0, 1.0)
        b = Detection(5.0, 0.0, 10.0, 1.0)
        # overlap 5x10=50, union 200-50=150
        assert _square_iou(a, b) == pytest.approx(50.0 / 150.0)


class TestCompositeFrames:
    def test_shapes_and_gt(self):
        frames, gt = composite_frames(3, people_per_frame=2, seed=1)
        assert len(frames) == 3 and len(gt) == 3
        assert frames[0].shape == (360, 480, 3)
        assert frames[0].dtype == np.uint8
        for boxes in gt:
            assert len(boxes) == 2
            for b in boxes:
                assert b.size > 10  # person actually spans pixels

    def test_frames_differ(self):
        frames, _ = composite_frames(2, seed=2)
        assert np.abs(frames[0].astype(int) - frames[1].astype(int)).mean() > 1


class TestContourQuality:
    def test_single_person_recall(self):
        frames, gt = composite_frames(12, people_per_frame=1, seed=3)
        s = score_detector(ContourPersonDetector(), frames, gt)
        # design domain: rendered body on smooth background
        # (measured 1.00 / 1.00 / 0.89 — gate with slack for cv2 drift)
        assert s["recall"] >= 0.9, s
        assert s["precision"] >= 0.9, s
        assert s["mean_iou"] >= 0.75, s

    def test_two_person_recall(self):
        frames, gt = composite_frames(12, people_per_frame=2, seed=4)
        s = score_detector(ContourPersonDetector(), frames, gt)
        assert s["recall"] >= 0.9, s
        assert s["precision"] >= 0.9, s

    def test_empty_frame_no_detections(self):
        rng = np.random.RandomState(0)
        # smooth background only: no people -> no gradient blobs
        import cv2

        small = rng.randint(40, 215, (6, 8, 3), np.uint8)
        bg = cv2.resize(small, (480, 360), interpolation=cv2.INTER_CUBIC)
        dets = ContourPersonDetector()(bg)
        assert len(dets) == 0, dets
