"""AGORA leaderboard submission export.

Equivalent of reference `evaluate/val_results.py:40-157`: for each detected
person, project the predicted world-frame joints into the full frame with
the predicted focal length, scale 1280x720 -> 3840x2160 (x3), and write the
per-person pkl files the AGORA evaluation platform expects
(README.md:82-88).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Sequence

import numpy as np

from whmr_tpu.ops.camera import convert_pare_to_full_img_cam, perspective_projection

AGORA_RES = (720.0, 1280.0)  # (H, W) of the val/test frames
AGORA_UPSCALE = 3.0          # -> 3840x2160 (val_results.py:146-155)


def export_person(
    out_dir: str,
    img_name: str,
    person_idx: int,
    verts: np.ndarray,          # (6890, 3) world/camera mesh
    joints24: np.ndarray,       # (24, 3) SMPL kinematic joints
    joints49: np.ndarray,       # (49, 3) full joint set
    pred_cam: np.ndarray,       # (3,) weak-persp camera
    bbox_height: float,
    bbox_center: np.ndarray,    # (2,)
    focal_length: float,
) -> str:
    """Write one `<image>_personId_<i>.pkl` (val_results.py:144-157)."""
    import jax.numpy as jnp

    h, w = AGORA_RES
    cam_t = convert_pare_to_full_img_cam(
        jnp.asarray(pred_cam[None]),
        jnp.asarray([bbox_height]),
        jnp.asarray(bbox_center[None]),
        jnp.asarray([w]),
        jnp.asarray([h]),
        focal_length=jnp.asarray([focal_length]),
    )
    camera_center = jnp.asarray([[w / 2.0, h / 2.0]])
    joints2d = perspective_projection(
        jnp.asarray(joints49[None]), None, cam_t, focal_length, camera_center
    )
    payload = {
        "joints": np.asarray(joints2d[0]) * AGORA_UPSCALE,
        "verts": np.asarray(verts) + np.asarray(cam_t[0]),
        "allSmplJoints3d": np.asarray(joints24) + np.asarray(cam_t[0]),
    }
    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(img_name))[0]
    path = os.path.join(out_dir, f"{stem}_personId_{person_idx}.pkl")
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    return path


def export_batch(
    out_dir: str,
    img_names: Sequence[str],
    results: Dict[str, np.ndarray],
    det_scores: np.ndarray,
    score_thresh: float = 0.75,
) -> int:
    """Batch export with the detector-score gate (val_results.py:83)."""
    n = 0
    for i, name in enumerate(img_names):
        if det_scores[i] < score_thresh:
            continue
        export_person(
            out_dir, name, person_idx=i,
            verts=results["verts"][i],
            joints24=results["joints24"][i],
            joints49=results["joints49"][i],
            pred_cam=results["pred_cam"][i],
            bbox_height=float(results["bbox_height"][i]),
            bbox_center=results["center"][i],
            focal_length=float(results["focal_length"][i]),
        )
        n += 1
    return n
