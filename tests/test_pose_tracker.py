"""External OpenPose/STAF tracker glue (utils/pose_tracker.py): json-folder
parsing, tracklet -> Detection conversion, and the whmr-video hookup.
Capability counterpart of reference utils/pose_tracker.py:25-102."""

import json
import os

import numpy as np
import pytest

from whmr_tpu.utils.pose_tracker import (
    PosetrackDetector,
    read_posetrack_keypoints,
    run_openpose,
    tracklets_to_detections,
)


def _person(pid, cx, cy, half=20.0, conf=0.9, k=21):
    """Flat OpenPose pose_keypoints_2d list: k joints in a box around (cx, cy)."""
    rng = np.random.RandomState(pid * 1000 + int(cx))
    pts = rng.uniform(-half, half, (k, 2)) + (cx, cy)
    # pin the extremes so the kp bbox is exactly 2*half wide
    pts[0] = (cx - half, cy - half)
    pts[1] = (cx + half, cy + half)
    flat = np.concatenate([pts, np.full((k, 1), conf)], axis=1)
    return flat.reshape(-1).tolist()


def _write_json_folder(folder, n_frames=6):
    """Two people: pid 0 present every frame drifting right, pid 3 on
    frames 2..4 only. Returns the folder."""
    os.makedirs(folder, exist_ok=True)
    for i in range(n_frames):
        people = [{"person_id": [0], "pose_keypoints_2d": _person(0, 30 + 5 * i, 40)}]
        if 2 <= i <= 4:
            people.append(
                {"person_id": [3], "pose_keypoints_2d": _person(3, 90, 50)}
            )
        with open(os.path.join(folder, f"frame_{i:012d}_keypoints.json"), "w") as f:
            json.dump({"version": 1.3, "people": people}, f)
    return folder


class TestReadPosetrack:
    def test_groups_by_person_id(self, tmp_path):
        folder = _write_json_folder(str(tmp_path / "op"))
        people = read_posetrack_keypoints(folder)
        assert set(people) == {0, 3}
        assert people[0]["joints2d"].shape == (6, 21, 3)
        assert people[0]["frames"].tolist() == [0, 1, 2, 3, 4, 5]
        assert people[3]["frames"].tolist() == [2, 3, 4]

    def test_scalar_person_id_accepted(self, tmp_path):
        folder = str(tmp_path / "op")
        os.makedirs(folder)
        with open(os.path.join(folder, "f_000_keypoints.json"), "w") as f:
            json.dump(
                {"people": [{"person_id": 7, "pose_keypoints_2d": _person(7, 50, 50)}]},
                f,
            )
        assert set(read_posetrack_keypoints(folder)) == {7}


class TestTrackletsToDetections:
    def test_per_frame_detections_with_track_ids(self, tmp_path):
        people = read_posetrack_keypoints(_write_json_folder(str(tmp_path / "op")))
        per_frame = tracklets_to_detections(people, smooth=False)
        assert set(per_frame) == set(range(6))
        assert [d.track_id for d in per_frame[3]] == [0, 3]
        d0 = per_frame[0][0]
        # kp bbox is 40 px wide around (30, 40), margin 1.2
        assert d0.cx == pytest.approx(30, abs=1e-4)
        assert d0.cy == pytest.approx(40, abs=1e-4)
        assert d0.size == pytest.approx(48, abs=1e-4)

    def test_low_confidence_joints_skipped(self):
        joints = np.asarray(_person(0, 50, 50, conf=0.1)).reshape(1, -1, 3)
        people = {0: {"joints2d": joints.astype(np.float32),
                      "frames": np.array([0])}}
        assert tracklets_to_detections(people) == {}

    def test_smoothing_damps_jitter(self, tmp_path):
        rng = np.random.RandomState(1)
        frames = np.arange(12)
        joints = np.stack(
            [
                np.asarray(
                    _person(0, 50 + rng.uniform(-6, 6), 60)
                ).reshape(-1, 3)
                for _ in frames
            ]
        ).astype(np.float32)
        people = {0: {"joints2d": joints, "frames": frames}}
        raw = tracklets_to_detections(people, smooth=False)
        smooth = tracklets_to_detections(people, smooth=True)
        raw_cx = np.array([raw[i][0].cx for i in range(12)])
        sm_cx = np.array([smooth[i][0].cx for i in range(12)])
        assert np.abs(np.diff(sm_cx)).mean() < np.abs(np.diff(raw_cx)).mean()


class TestPosetrackDetector:
    def test_lookup_by_frame_stem(self, tmp_path):
        det = PosetrackDetector.from_json_folder(
            _write_json_folder(str(tmp_path / "op")), smooth=False
        )
        img = np.zeros((128, 128, 3), np.uint8)
        assert len(det(img, "000003.png")) == 2
        assert len(det(img, "000005.png")) == 1
        assert det(img, "000099.png") == []
        assert det(img, "not_a_frame.png") == []

    def test_out_of_frame_detection_dropped(self, tmp_path):
        det = PosetrackDetector.from_json_folder(
            _write_json_folder(str(tmp_path / "op")), smooth=False
        )
        # person 3 sits at (90, 50); a 64-px-wide frame excludes it
        assert [d.track_id for d in det(np.zeros((128, 64, 3), np.uint8),
                                        "000003.png")] == [0]


class TestRunOpenpose:
    def test_missing_binary_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError, match="openpose binary"):
            run_openpose("v.mp4", str(tmp_path / "out"), str(tmp_path))


class TestVideoCliHookup:
    def test_openpose_json_replaces_detector(self, tmp_path, monkeypatch):
        """whmr-video --openpose_json wires a PosetrackDetector, untracked."""
        from whmr_tpu.inference import video_cli

        folder = _write_json_folder(str(tmp_path / "op"))
        captured = {}

        class _FakePipeline:
            detector = None
            cfg = None

            def run_folder(self, image_folder, output_folder, **k):
                os.makedirs(output_folder, exist_ok=True)
                captured["detector"] = self.detector
                return {"images": 0, "people": 0, "fps": 0.0}

        import cv2
        import numpy as np_

        clip = str(tmp_path / "in.mp4")
        w = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (32, 32))
        for _ in range(2):
            w.write(np_.zeros((32, 32, 3), np_.uint8))
        w.release()

        monkeypatch.setattr(
            "whmr_tpu.inference.demo_cli.build_pipeline",
            lambda args: _FakePipeline(),
        )
        video_cli.main(
            [
                "--video", clip,
                "--output_folder", str(tmp_path / "out"),
                "--openpose_json", folder,
            ]
        )
        assert isinstance(captured["detector"], PosetrackDetector)
