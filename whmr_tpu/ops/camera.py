"""Camera models: weak-perspective and full-image perspective projection.

Functional equivalents of the reference `utils/geometry.py` camera stack
(projection :289, perspective_projection :310, convert_pare_to_full_img_cam
:139, estimate_translation :386) and `utils/cam_utils.py` bin decoding.

TPU-first notes:
- `estimate_translation` replaces the reference's PER-SAMPLE numpy weighted
  least squares (a GPU->CPU hotspot inside the training loop,
  core/trainer.py:433-436) with one batched closed-form 3x3 solve on device.
- The projection matrix multiply is expressed without materializing K: the
  intrinsics are diagonal + principal point, so it is a scale-and-shift.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from jax import lax

# Geometry einsums are tiny (3x3) but accuracy-critical downstream (mm-level
# joint metrics); force fp32 MXU passes instead of the TPU bf16 default.
_HI = lax.Precision.HIGHEST

from whmr_tpu.config import FOCAL_LENGTH


def perspective_projection(
    points: jnp.ndarray,
    rotation: Optional[jnp.ndarray],
    translation: Optional[jnp.ndarray],
    focal_length,
    camera_center: jnp.ndarray,
    retain_z: bool = False,
) -> jnp.ndarray:
    """Project (B, N, 3) points with per-sample intrinsics.

    Matches reference utils/geometry.py:310-341:
      x' = K @ ((R p + t) / z)  with K = diag(f, f, 1) + principal point.

    Args:
      points: (B, N, 3).
      rotation: (B, 3, 3) or None (identity).
      translation: (B, 3) or None.
      focal_length: scalar or (B,).
      camera_center: (B, 2).
    """
    if rotation is not None:
        points = jnp.einsum("bij,bkj->bki", rotation, points, precision=_HI)
    if translation is not None:
        points = points + translation[:, None, :]
    z = points[..., 2:3]
    xy = points[..., :2] / z
    f = jnp.asarray(focal_length, dtype=points.dtype)
    f = jnp.broadcast_to(jnp.atleast_1d(f), (points.shape[0],))
    proj = xy * f[:, None, None] + camera_center[:, None, :]
    if retain_z:
        return jnp.concatenate([proj, jnp.ones_like(z)], axis=-1)
    return proj


def weak_perspective_projection(
    joints: jnp.ndarray,
    camera: jnp.ndarray,
    img_res: Tuple[int, int] = (256, 256),
    retain_z: bool = False,
) -> jnp.ndarray:
    """Crop-frame weak-perspective projection, normalized to [-1, 1].

    Matches reference utils/geometry.py:289-307 (`projection`): the weak
    camera [s, tx, ty] becomes a translation [tx, ty, 2f/(H*s)] under fixed
    FOCAL_LENGTH=1000, then a pinhole projection with camera center 0 and
    normalization by (W/2, H/2).

    Args:
      joints: (B, N, 3) camera-frame points.
      camera: (B, 3) weak-perspective [s, tx, ty].
      img_res: (W, H) crop resolution (cfg.IMG_RES).
    """
    w, h = img_res
    cam_t = jnp.stack(
        [camera[:, 1], camera[:, 2], 2 * FOCAL_LENGTH / (h * camera[:, 0] + 1e-9)],
        axis=-1,
    )
    batch = joints.shape[0]
    center = jnp.zeros((batch, 2), dtype=joints.dtype)
    kp = perspective_projection(
        joints, None, cam_t, FOCAL_LENGTH, center, retain_z=retain_z
    )
    norm = jnp.asarray([w / 2.0, h / 2.0], dtype=joints.dtype)
    if retain_z:
        return kp.at[..., :2].set(kp[..., :2] / norm)
    return kp / norm


def convert_pare_to_full_img_cam(
    pare_cam: jnp.ndarray,
    bbox_height: jnp.ndarray,
    bbox_center: jnp.ndarray,
    img_w: jnp.ndarray,
    img_h: jnp.ndarray,
    focal_length=None,
    tz=None,
) -> jnp.ndarray:
    """Weak-perspective bbox camera -> full-image perspective translation.

    Matches reference utils/geometry.py:139-157 including the Tz form
    (tz given directly instead of 2f/(h*s)); from CLIFF/SPEC
    (arXiv:2009.06549).
    """
    s, tx, ty = pare_cam[:, 0], pare_cam[:, 1], pare_cam[:, 2]
    if focal_length is None:
        tz_val = tz
    else:
        tz_val = 2 * focal_length / (bbox_height * s)
    cx = 2 * (bbox_center[:, 0] - (img_w / 2.0)) / (s * bbox_height)
    cy = 2 * (bbox_center[:, 1] - (img_h / 2.0)) / (s * bbox_height)
    return jnp.stack([tx + cx, ty + cy, tz_val], axis=-1)


def estimate_translation(
    joints_3d: jnp.ndarray,
    joints_2d: jnp.ndarray,
    focal_length: float = 5000.0,
    img_size: Tuple[float, float] = (224.0, 224.0),
    use_joints_slice: bool = True,
) -> jnp.ndarray:
    """Batched weighted-LSQ camera translation fit, fully on device.

    Replaces reference utils/geometry.py:344-408 (`estimate_translation_np`
    looped per sample on CPU) with the same normal-equation solve expressed
    as batched reductions + one (B, 3, 3) `jnp.linalg.solve`.

    For each sample, solves min_t sum_j w_j || f*(X+tx, Y+ty)/(Z+tz)*?? ...
    linearized as the reference does:
        Q = [f*e_x, f*e_y, (c - p2d)],  rhs = (p2d - c)*Z - f*XY
    with per-coordinate weights sqrt(conf).

    Args:
      joints_3d: (B, J, 3) model joints (reference uses the GT 24 slice
        [25:49], applied here when use_joints_slice).
      joints_2d: (B, J, 3) pixel keypoints with confidence in [..., 2].
    """
    if use_joints_slice:
        joints_3d = joints_3d[:, 25:, :]
        joints_2d = joints_2d[:, 25:, :]
    conf = joints_2d[..., 2]
    p2d = joints_2d[..., :2]
    f = jnp.asarray(focal_length, dtype=joints_3d.dtype)
    center = jnp.asarray(img_size, dtype=joints_3d.dtype) / 2.0

    z = joints_3d[..., 2]  # (B, J)
    xy = joints_3d[..., :2]  # (B, J, 2)
    w = jnp.sqrt(jnp.maximum(conf, 0.0))[..., None]  # (B, J, 1)

    # Rows of the design matrix, two per joint (x and y equations):
    #   [f, 0, cx - u] tx_ty_tz = (u - cx) z - f X
    #   [0, f, cy - v]            (v - cy) z - f Y
    # Stack both coordinates into the J axis.
    b, j = z.shape
    q_f = jnp.zeros((b, j, 2, 2), dtype=joints_3d.dtype)
    q_f = q_f.at[:, :, 0, 0].set(f)
    q_f = q_f.at[:, :, 1, 1].set(f)
    q_last = (center[None, None, :] - p2d)[..., None]  # (B, J, 2, 1)
    q = jnp.concatenate([q_f, q_last], axis=-1)  # (B, J, 2, 3)
    rhs = (p2d - center[None, None, :]) * z[..., None] - f * xy  # (B, J, 2)

    qw = q * w[..., None]
    rw = rhs * w
    q_flat = qw.reshape(b, 2 * j, 3)
    r_flat = rw.reshape(b, 2 * j)
    a_mat = jnp.einsum("bnk,bnl->bkl", q_flat, q_flat, precision=_HI)
    b_vec = jnp.einsum("bnk,bn->bk", q_flat, r_flat, precision=_HI)
    return jnp.linalg.solve(a_mat, b_vec[..., None])[..., 0]


# ---------------------------------------------------------------------------
# CamCalib bin decoding (reference utils/cam_utils.py:39-135)
# ---------------------------------------------------------------------------

# Bin ranges: vfov in [0.2617, 2.1], pitch in [-0.6, 0.6], roll in [-0.6, 0.6]
# (softargmax decode path, cam_utils.py:55,39,103,127-135).
VFOV_RANGE = (0.2617, 2.1)
PITCH_RANGE = (-0.6, 0.6)
ROLL_RANGE = (-0.6, 0.6)


def softargmax_1d(heatmap: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """Differentiable argmax over the last axis, output in [-1, 1].

    Equivalent to pare's `softargmax1d` with normalize_keypoints=True
    (used via cam_utils.py:114-118): softmax over bins, expectation of the
    bin index, scaled to [-1, 1].
    """
    n = heatmap.shape[-1]
    probs = jnp.exp(heatmap - jnp.max(heatmap, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    idx = jnp.arange(n, dtype=heatmap.dtype)
    expected = jnp.sum(probs * idx, axis=-1)
    if normalize:
        expected = expected / (n - 1) * 2.0 - 1.0
    return expected


def soft_idx_to_angle(soft_idx: jnp.ndarray, lo: float, hi: float) -> jnp.ndarray:
    """[-1, 1] soft index -> angle (reference cam_utils.py:110-111)."""
    return (hi - lo) * ((soft_idx + 1) / 2.0) + lo


def decode_cam_angles(
    vfov_logits: jnp.ndarray, pitch_logits: jnp.ndarray, roll_logits: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """256-bin logits -> (vfov, pitch, roll) angles in radians.

    Matches reference `convert_preds_to_angles(..., loss_type='softargmax_l2')`
    (cam_utils.py:122-135) as invoked by whmr.py:511-514.
    """
    vfov = soft_idx_to_angle(softargmax_1d(vfov_logits), *VFOV_RANGE)
    pitch = soft_idx_to_angle(softargmax_1d(pitch_logits), *PITCH_RANGE)
    roll = soft_idx_to_angle(softargmax_1d(roll_logits), *ROLL_RANGE)
    return vfov, pitch, roll
