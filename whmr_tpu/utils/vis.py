"""Visualization utilities: skeleton drawing, joint plots, horizon line.

Equivalent of reference `utils/vis.py` / `utils/vis_utils.py` /
`utils/uv_vis.py` essentials (skeleton drawing :52-210, horizon-line vis,
IUV visualization), host-side numpy/cv2.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import cv2
import numpy as np

# Skeleton edges over the SPIN 49-joint set's GT slice (25:49 -> J24) and
# over the 25 OpenPose joints.
J24_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (6, 7), (7, 8), (8, 9), (9, 10),
    (10, 11), (8, 12), (9, 12), (12, 13), (2, 14), (3, 14), (14, 16), (16, 15),
    (15, 12), (17, 18),
]
OPENPOSE_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (6, 7), (1, 8), (8, 9),
    (9, 10), (10, 11), (8, 12), (12, 13), (13, 14), (0, 15), (0, 16),
    (15, 17), (16, 18), (14, 19), (19, 20), (14, 21), (11, 22), (22, 23),
    (11, 24),
]


def draw_skeleton(
    image: np.ndarray,
    kp_2d: np.ndarray,
    edges: Optional[Sequence[Tuple[int, int]]] = None,
    vis_thresh: float = 0.3,
    radius: int = 3,
) -> np.ndarray:
    """Draw 2D keypoints + bones on an image (reference vis.py draw_skeleton).

    kp_2d: (J, 2) or (J, 3) pixel coordinates (+confidence).
    """
    out = image.copy()
    conf = kp_2d[:, 2] if kp_2d.shape[1] > 2 else np.ones(len(kp_2d))
    if edges is None:
        edges = OPENPOSE_EDGES if len(kp_2d) in (25, 49) else J24_EDGES
    for a, b in edges:
        if a < len(kp_2d) and b < len(kp_2d) and conf[a] > vis_thresh and conf[b] > vis_thresh:
            pa = tuple(np.round(kp_2d[a, :2]).astype(int))
            pb = tuple(np.round(kp_2d[b, :2]).astype(int))
            cv2.line(out, pa, pb, (0, 255, 128), 2)
    for j, (x, y) in enumerate(kp_2d[:, :2]):
        if conf[j] > vis_thresh:
            cv2.circle(out, (int(round(x)), int(round(y))), radius, (255, 64, 64), -1)
    return out


def draw_horizon_line(
    image: np.ndarray, pitch: float, roll: float, vfov: float
) -> np.ndarray:
    """Overlay the camera horizon implied by (pitch, roll, vfov) — the
    CamCalib visual check (reference vis_utils.py horizon drawing).

    The horizon's vertical offset at the image center is
    f * tan(pitch); the line is tilted by roll.
    """
    out = image.copy()
    h, w = image.shape[:2]
    f = (h / 2.0) / np.tan(vfov / 2.0)
    y_mid = h / 2.0 + f * np.tan(pitch)
    dx = w / 2.0
    dy = np.tan(roll) * dx
    p1 = (0, int(round(y_mid - dy)))
    p2 = (w - 1, int(round(y_mid + dy)))
    cv2.line(out, p1, p2, (0, 128, 255), 2)
    return out


def iuv_to_rgb(iuv_image: np.ndarray) -> np.ndarray:
    """IUV map (H, W, 3 in [0,1]) -> displayable uint8 (uv_vis.py style)."""
    return np.clip(iuv_image * 255.0, 0, 255).astype(np.uint8)


def colormap_depth(depth: np.ndarray, mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Inverse-depth map -> JET colormap visualization."""
    d = depth.astype(np.float32)
    if mask is None:
        mask = d > 0
    if mask.any():
        lo, hi = d[mask].min(), d[mask].max()
        norm = np.where(mask, (d - lo) / max(hi - lo, 1e-9), 0.0)
    else:
        norm = np.zeros_like(d)
    vis = cv2.applyColorMap((norm * 255).astype(np.uint8), cv2.COLORMAP_JET)
    vis[~mask] = 0
    return vis[:, :, ::-1]
