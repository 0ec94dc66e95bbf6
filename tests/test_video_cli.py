"""Video path: frames <-> video helpers, cross-frame tracking detector,
and the whmr-video CLI end-to-end on a tiny synthetic clip."""

import os

import cv2
import numpy as np

from whmr_tpu.inference.pipeline import Detection
from whmr_tpu.inference.video import images_to_video, video_to_images
from whmr_tpu.inference.video_cli import TrackingDetector


def _write_clip(path, n_frames=6, size=(64, 96)):
    h, w = size
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (w, h)
    )
    rng = np.random.RandomState(0)
    for i in range(n_frames):
        frame = np.full((h, w, 3), 40, np.uint8)
        # a bright blob drifting right, so contour detection has a target
        x = 20 + 6 * i
        cv2.circle(frame, (x, h // 2), 12, (220, 210, 200), -1)
        frame += rng.randint(0, 8, frame.shape, dtype=np.uint8)
        writer.write(frame)
    writer.release()
    return path


class TestVideoHelpers:
    def test_round_trip(self, tmp_path):
        clip = _write_clip(str(tmp_path / "in.mp4"))
        frames = video_to_images(clip, str(tmp_path / "frames"), every_n=2)
        assert len(frames) == 3
        out = images_to_video(frames, str(tmp_path / "out.mp4"), fps=5.0)
        assert os.path.exists(out)
        cap = cv2.VideoCapture(out)
        assert cap.isOpened() and cap.read()[0]
        cap.release()


class _JitteryDetector:
    """One box per frame with additive jitter: the tracker must keep ONE
    track id and the one-Euro filter must damp the jitter."""

    def __init__(self):
        self.i = 0
        self.rng = np.random.RandomState(1)

    def __call__(self, image, name=""):
        self.i += 1
        j = self.rng.uniform(-8, 8, 2)
        return [Detection(100 + j[0], 80 + j[1], 60 + self.rng.uniform(-5, 5))]


class TestTrackingDetector:
    def test_single_track_and_smoothing(self):
        raw = _JitteryDetector()
        det = TrackingDetector(_JitteryDetector())
        img = np.zeros((160, 200, 3), np.uint8)
        raw_cx, smooth_cx, tids = [], [], []
        for i in range(12):
            raw_cx.append(raw(img)[0].cx)
            d = det(img, f"{i:06d}.png")[0]
            smooth_cx.append(d.cx)
            tids.append(d.track_id)
        assert set(tids) == {0}, tids  # one stable track
        # smoothing reduces frame-to-frame movement vs the raw detections
        raw_step = np.abs(np.diff(raw_cx)).mean()
        smooth_step = np.abs(np.diff(smooth_cx)).mean()
        assert smooth_step < raw_step

    def test_new_track_for_distant_box(self):
        det = TrackingDetector(lambda img: [Detection(30, 30, 20)])
        img = np.zeros((160, 200, 3), np.uint8)
        first = det(img)[0].track_id
        det.base = lambda img: [Detection(170, 140, 20)]  # no IoU overlap
        second = det(img)[0].track_id
        assert first != second

    def test_tracks_age_out_across_empty_frames(self):
        """A detection gap must still tick the tracker: without it a track
        (and its one-Euro filter, with minutes-old state) survives any gap
        and reattaches its identity to the next person near the old bbox."""
        det = TrackingDetector(lambda img: [Detection(100, 80, 40)])
        img = np.zeros((160, 200, 3), np.uint8)
        first = det(img)[0].track_id
        assert det.filters  # filter state exists for the live track
        det.base = lambda img: []  # person leaves the frame
        for _ in range(det.tracker.max_age + 2):
            assert det(img) == []
        assert not det.tracker._tracks  # track aged out during the gap
        assert not det.filters          # filter state pruned with it
        det.base = lambda img: [Detection(100, 80, 40)]  # same spot, later
        again = det(img)[0].track_id
        assert again != first  # new identity, not the stale track's


class TestVideoCLI:
    def test_end_to_end(self, tmp_path, monkeypatch):
        from whmr_tpu.inference import video_cli

        clip = _write_clip(str(tmp_path / "clip.mp4"), n_frames=4)
        out = str(tmp_path / "out")
        monkeypatch.setenv("WHMR_DATA_DIR", "")  # synthetic assets
        video_cli.main([
            "--video", clip,
            "--output_folder", out,
            "--detector", "contour",
            "--max_people", "2",
            "--no_camcalib",
            "--every_n", "2",
            "--misc", "pymaf.mlp_dim", "(32,16,8,4)",
            "deconv.num_filters", "(32,32,32)",
            "vit.embed_dim", "64", "vit.depth", "1", "vit.num_heads", "2",
        ])
        pkls = [f for f in os.listdir(os.path.join(out, "results")) if f.endswith(".pkl")]
        assert len(pkls) == 2  # every_n=2 of 4 frames
        assert os.path.exists(os.path.join(out, "result.mp4"))

    def test_rerun_does_not_mix_stale_outputs(self, tmp_path, monkeypatch):
        from whmr_tpu.inference import video_cli

        out = str(tmp_path / "out")
        common = [
            "--output_folder", out, "--detector", "contour", "--max_people", "2",
            "--no_camcalib",
            "--misc", "pymaf.mlp_dim", "(32,16,8,4)",
            "deconv.num_filters", "(32,32,32)",
            "vit.embed_dim", "64", "vit.depth", "1", "vit.num_heads", "2",
        ]
        clip_a = _write_clip(str(tmp_path / "a.mp4"), n_frames=6)
        video_cli.main(["--video", clip_a, "--every_n", "1"] + common)
        clip_b = _write_clip(str(tmp_path / "b.mp4"), n_frames=2)
        video_cli.main(["--video", clip_b, "--every_n", "1"] + common)
        pkls = [f for f in os.listdir(os.path.join(out, "results")) if f.endswith(".pkl")]
        assert len(pkls) == 2  # only clip_b's frames, no leftovers from clip_a
