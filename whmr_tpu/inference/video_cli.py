"""`whmr-video` CLI: video in -> tracked per-frame meshes -> video out.

Completes the reference's dormant video path as a first-class flow: the
reference ships video<->frames ffmpeg glue (`utils/demo_utils.py:29-201`),
bbox smoothing (`utils/smooth_bbox.py`) and external-tracker regrouping
(`utils/pose_tracker.py:25-102`) but no driver that ties them together.
Here: frames are extracted (cv2), any demo detector backend runs per frame,
detections are associated across frames (greedy IoU) and their bbox params
smoothed per track (one-Euro), the folder demo pipeline renders overlays,
and the overlay frames are re-encoded to a video.
"""

from __future__ import annotations

import argparse
import os
import tempfile
from typing import List

import numpy as np


class TrackingDetector:
    """Wrap a per-image detector with cross-frame association + smoothing.

    Frames must be processed in order (run_folder walks sorted names, and
    video frames are written with zero-padded indices). Each track id gets
    a one-Euro filter over (cx, cy, size); the reference's equivalents are
    smooth_bbox.get_smooth_bbox_params and the pose_tracker regrouping.
    """

    def __init__(self, base, min_cutoff: float = 0.6, beta: float = 0.1):
        from whmr_tpu.utils.tracking import GreedyIoUTracker

        self.base = base
        self.tracker = GreedyIoUTracker()
        self.filters = {}
        self.min_cutoff = min_cutoff
        self.beta = beta

    def __call__(self, image: np.ndarray, name: str = "") -> List:
        from whmr_tpu.utils.tracking import OneEuroFilter

        try:
            dets = self.base(image, name)
        except TypeError:
            dets = self.base(image)
        if not dets:
            return dets
        boxes = np.array(
            [
                [d.cx - d.size / 2, d.cy - d.size / 2,
                 d.cx + d.size / 2, d.cy + d.size / 2]
                for d in dets
            ],
            np.float32,
        )
        ids = self.tracker.update(boxes)
        for det, tid in zip(dets, ids):
            f = self.filters.setdefault(
                tid, OneEuroFilter(min_cutoff=self.min_cutoff, beta=self.beta)
            )
            cx, cy, size = f(np.array([det.cx, det.cy, det.size], np.float32))
            det.cx, det.cy, det.size = float(cx), float(cy), float(size)
            det.track_id = tid
        return dets


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="WHMR video demo")
    p.add_argument("--video", required=True)
    p.add_argument("--output_folder", default="output_video")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--data_dir", default=None)
    p.add_argument("--detector", default="iuv",
                   choices=["full", "file", "iuv", "contour"])
    p.add_argument("--bbox_file", default=None)
    p.add_argument("--max_people", type=int, default=8)
    p.add_argument("--every_n", type=int, default=1, help="process every Nth frame")
    p.add_argument("--fps", type=float, default=30.0, help="output video fps")
    p.add_argument("--no_camcalib", action="store_true")
    p.add_argument("--no_track", action="store_true",
                   help="disable cross-frame tracking/smoothing")
    p.add_argument("--misc", nargs="*", default=[])
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from whmr_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    from whmr_tpu.inference.demo_cli import build_pipeline
    from whmr_tpu.inference.detector import build_detector
    from whmr_tpu.inference.video import images_to_video, video_to_images

    pipeline = build_pipeline(args)
    base = build_detector(args.detector, args.bbox_file, pipeline=pipeline)
    pipeline.detector = base if args.no_track else TrackingDetector(base)

    os.makedirs(args.output_folder, exist_ok=True)
    frame_dir = os.path.join(args.output_folder, "frames")
    frames = video_to_images(args.video, frame_dir, every_n=args.every_n)
    print(f"extracted {len(frames)} frames -> {frame_dir}")
    stats = pipeline.run_folder(frame_dir, args.output_folder, render=True)

    overlays = sorted(
        os.path.join(args.output_folder, f)
        for f in os.listdir(args.output_folder)
        if f.endswith("_overlay.png")
    )
    out_path = os.path.join(args.output_folder, "result.mp4")
    if overlays:
        images_to_video(overlays, out_path, fps=args.fps / args.every_n)
    print(
        f"W-HMR video: {stats['images']} frames, {stats['people']} people, "
        f"{stats['fps']:.2f} fps -> {out_path}"
    )


if __name__ == "__main__":
    main()
