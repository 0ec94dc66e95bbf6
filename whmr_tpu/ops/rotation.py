"""Rotation representation conversions, batched and jit-safe.

Functional equivalents of the reference's `utils/geometry.py` rotation zoo
(batch_rodrigues :14, quat_to_rotmat :31, rotation_matrix_to_angle_axis :54,
rot6d_to_rotmat :243, unbiased_gram_schmidt :260, rotmat_to_rot6d :275) and
pare's `batch_euler2matrix` (used by whmr.py:521-522 for CamCalib).

All functions accept a leading batch dimension (or arbitrary leading dims
where noted), run entirely on-device, and contain no data-dependent control
flow — branches are expressed with `jnp.where` so a single XLA program covers
every input.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def _normalize(v: jnp.ndarray, axis: int = -1, eps: float = _EPS) -> jnp.ndarray:
    """L2-normalize along `axis` (torch F.normalize semantics: clamp norm)."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix.

    Matches reference utils/geometry.py:31-51.
    """
    q = quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True), _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return m.reshape(*q.shape[:-1], 3, 3)


def batch_rodrigues(theta: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3).

    Matches reference utils/geometry.py:14-28 (axis-angle -> quaternion ->
    matrix with the same +1e-8 norm bias).
    """
    angle = jnp.linalg.norm(theta + 1e-8, axis=-1, keepdims=True)
    normalized = theta / angle
    half = angle * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * normalized], axis=-1)
    return quat_to_rotmat(quat)


def rot6d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation -> (N, 3, 3) rotation matrices.

    Zhou et al. CVPR'19 continuous representation; matches reference
    utils/geometry.py:243-257: x reshaped to (-1, 3, 2), Gram-Schmidt on the
    two column vectors, third column from the cross product.
    """
    x = x.reshape(-1, 3, 2)
    a1 = x[:, :, 0]
    a2 = x[:, :, 1]
    b1 = _normalize(a1)
    b2 = _normalize(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_rot6d(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 3, 3) -> (B, 6): first two columns flattened (geometry.py:275-286)."""
    batch = x.shape[0]
    return x[:, :, :2].reshape(batch, 6)


def unbiased_gram_schmidt(x: jnp.ndarray) -> jnp.ndarray:
    """Symmetrized orthonormalization of near-rotation matrices.

    Matches reference utils/geometry.py:260-272: treats the three COLUMNS
    t1,t2,t3 of each 3x3 as noisy frame axes and rebuilds an exact rotation:
      r1 = normalize((t2 x t3 + t1)/2)
      r2 = normalize(((t3 x r1 + t2)/2) orthogonalized against r1)
      r3 = r1 x r2
    Input (..., K, 3, 3) or (N, 3, 3); output same shape.
    """
    orig_shape = x.shape
    x = x.reshape(-1, 3, 3)
    t1 = x[:, :, 0]
    t2 = x[:, :, 1]
    t3 = x[:, :, 2]
    r1 = _normalize((jnp.cross(t2, t3) + t1) / 2.0)
    r2_ = (jnp.cross(t3, r1) + t2) / 2.0
    r2 = _normalize(r2_ - jnp.sum(r2_ * r1, axis=-1, keepdims=True) * r1)
    r3 = jnp.cross(r1, r2)
    rotmat = jnp.stack([r1, r2, r3], axis=-1)
    return rotmat.reshape(orig_shape)


def rotmat_to_quat(rotmat: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """(N, 3, 3) rotation matrices -> (N, 4) wxyz quaternions.

    Branch-free reformulation of the kornia four-case algorithm used by the
    reference (utils/geometry.py:160-240): all four candidate quaternions are
    computed and the numerically-stable one selected with `jnp.where`. This
    maps to pure VPU ops on TPU — no divergent control flow.
    """
    # The reference transposes (it receives 3x4 row-major); we take 3x3 and
    # follow the same math on R^T entries.
    rmat_t = jnp.swapaxes(rotmat, -1, -2)
    m = rmat_t

    mask_d2 = m[:, 2, 2] < eps
    mask_d0_d1 = m[:, 0, 0] > m[:, 1, 1]
    mask_d0_nd1 = m[:, 0, 0] < -m[:, 1, 1]

    t0 = 1 + m[:, 0, 0] - m[:, 1, 1] - m[:, 2, 2]
    q0 = jnp.stack(
        [m[:, 1, 2] - m[:, 2, 1], t0, m[:, 0, 1] + m[:, 1, 0], m[:, 2, 0] + m[:, 0, 2]],
        axis=-1,
    )
    t1 = 1 - m[:, 0, 0] + m[:, 1, 1] - m[:, 2, 2]
    q1 = jnp.stack(
        [m[:, 2, 0] - m[:, 0, 2], m[:, 0, 1] + m[:, 1, 0], t1, m[:, 1, 2] + m[:, 2, 1]],
        axis=-1,
    )
    t2 = 1 - m[:, 0, 0] - m[:, 1, 1] + m[:, 2, 2]
    q2 = jnp.stack(
        [m[:, 0, 1] - m[:, 1, 0], m[:, 2, 0] + m[:, 0, 2], m[:, 1, 2] + m[:, 2, 1], t2],
        axis=-1,
    )
    t3 = 1 + m[:, 0, 0] + m[:, 1, 1] + m[:, 2, 2]
    q3 = jnp.stack(
        [t3, m[:, 1, 2] - m[:, 2, 1], m[:, 2, 0] - m[:, 0, 2], m[:, 0, 1] - m[:, 1, 0]],
        axis=-1,
    )

    c0 = (mask_d2 & mask_d0_d1)[:, None]
    c1 = (mask_d2 & ~mask_d0_d1)[:, None]
    c2 = (~mask_d2 & mask_d0_nd1)[:, None]
    # c3 is the complement.

    q = jnp.where(c0, q0, jnp.where(c1, q1, jnp.where(c2, q2, q3)))
    t = jnp.where(
        c0[:, 0], t0, jnp.where(c1[:, 0], t1, jnp.where(c2[:, 0], t2, t3))
    )
    q = q * (0.5 / jnp.sqrt(jnp.maximum(t, eps)))[:, None]
    return q


def quat_to_angle_axis(quaternion: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3) axis-angle.

    Branch-free version of the ceres algorithm used by the reference
    (utils/geometry.py:86-136), with the same small-angle fallback k=2.
    """
    q1 = quaternion[..., 1]
    q2 = quaternion[..., 2]
    q3 = quaternion[..., 3]
    sin_sq = q1 * q1 + q2 * q2 + q3 * q3
    sin_theta = jnp.sqrt(jnp.maximum(sin_sq, 0.0))
    cos_theta = quaternion[..., 0]
    two_theta = 2.0 * jnp.where(
        cos_theta < 0.0,
        jnp.arctan2(-sin_theta, -cos_theta),
        jnp.arctan2(sin_theta, cos_theta),
    )
    # Guard the division for the sin->0 limit, then select the Taylor value.
    k_pos = two_theta / jnp.maximum(sin_theta, _EPS)
    k = jnp.where(sin_sq > 0.0, k_pos, 2.0 * jnp.ones_like(sin_theta))
    aa = jnp.stack([q1 * k, q2 * k, q3 * k], axis=-1)
    return jnp.nan_to_num(aa)


def rotmat_to_angle_axis(rotmat: jnp.ndarray) -> jnp.ndarray:
    """(N, 3, 3) -> (N, 3) axis-angle (reference utils/geometry.py:54-83)."""
    return quat_to_angle_axis(rotmat_to_quat(rotmat))


def euler_to_rotmat(euler: jnp.ndarray) -> jnp.ndarray:
    """(B, 3) euler angles (x=pitch, y=yaw, z=roll) -> (B, 3, 3).

    Matches pare's `batch_euler2matrix` (euler -> wxyz quaternion -> matrix)
    used by the reference at whmr.py:521-522 to build the CamCalib rotation.
    """
    half = euler * 0.5
    cx, cy, cz = jnp.cos(half[..., 0]), jnp.cos(half[..., 1]), jnp.cos(half[..., 2])
    sx, sy, sz = jnp.sin(half[..., 0]), jnp.sin(half[..., 1]), jnp.sin(half[..., 2])
    quat = jnp.stack(
        [
            cx * cy * cz - sx * sy * sz,
            cx * sy * sz + cy * cz * sx,
            cx * cz * sy - sx * cy * sz,
            cx * cy * sz + sx * cz * sy,
        ],
        axis=-1,
    )
    return quat_to_rotmat(quat)
