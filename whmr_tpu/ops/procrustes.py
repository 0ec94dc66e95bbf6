"""Batched Procrustes alignment and pose metrics (MPJPE / PA-MPJPE / PVE).

TPU-first replacement for the reference's per-sample numpy SVD loop
(`utils/pose_utils.py:10-75`, `compute_similarity_transform_batch` called from
core/trainer.py:869-887 and evaluate/eval.py:226-228): one batched
`jnp.linalg.svd` over (B, 3, 3) covariance matrices — the whole evaluation
epoch's alignment runs as a single XLA program instead of B host round trips.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_HI = lax.Precision.HIGHEST


def batch_compute_similarity_transform(s1: jnp.ndarray, s2: jnp.ndarray) -> jnp.ndarray:
    """Align each (J, 3) point set in `s1` to `s2` with a similarity transform.

    Same math as reference utils/pose_utils.py:10-58 (umeyama / orthogonal
    Procrustes with scale), batched: returns s1_hat = s*R s1 + t.

    Args:
      s1, s2: (B, J, 3).
    """
    # Work in the (3, J) convention of the reference.
    x1 = jnp.swapaxes(s1, -1, -2)  # (B, 3, J)
    x2 = jnp.swapaxes(s2, -1, -2)

    mu1 = x1.mean(axis=-1, keepdims=True)
    mu2 = x2.mean(axis=-1, keepdims=True)
    x1c = x1 - mu1
    x2c = x2 - mu2

    var1 = jnp.sum(x1c**2, axis=(-1, -2))  # (B,)
    k = jnp.einsum("bij,bkj->bik", x1c, x2c, precision=_HI)  # (B, 3, 3)

    u, _, vh = jnp.linalg.svd(k)
    v = jnp.swapaxes(vh, -1, -2)
    det = jnp.linalg.det(jnp.einsum("bij,bkj->bik", u, v, precision=_HI))  # det(U V^T)
    z = jnp.broadcast_to(jnp.eye(3, dtype=s1.dtype), k.shape)
    z = z.at[:, -1, -1].set(jnp.sign(det))
    r = jnp.einsum("bij,bjk,blk->bil", v, z, u, precision=_HI)  # V Z U^T

    scale = jnp.einsum("bii->b", jnp.einsum("bij,bjk->bik", r, k, precision=_HI)) / var1
    t = mu2 - scale[:, None, None] * jnp.einsum("bij,bjk->bik", r, mu1, precision=_HI)
    s1_hat = scale[:, None, None] * jnp.einsum("bij,bjk->bik", r, x1, precision=_HI) + t
    return jnp.swapaxes(s1_hat, -1, -2)


def mpjpe(pred: jnp.ndarray, gt: jnp.ndarray, reduce: str = "mean") -> jnp.ndarray:
    """Mean per-joint position error over (B, J, 3) in input units.

    Matches the eval definition (evaluate/eval.py:222-223): sqrt of squared
    coordinate error summed over xyz, averaged over joints.
    """
    err = jnp.sqrt(jnp.sum((pred - gt) ** 2, axis=-1)).mean(axis=-1)
    if reduce == "mean":
        return err.mean()
    return err


def pa_mpjpe(pred: jnp.ndarray, gt: jnp.ndarray, reduce: str = "mean") -> jnp.ndarray:
    """Procrustes-aligned MPJPE (reference pose_utils.py:68-75)."""
    aligned = batch_compute_similarity_transform(pred, gt)
    return mpjpe(aligned, gt, reduce=reduce)


def per_vertex_error(pred_verts: jnp.ndarray, gt_verts: jnp.ndarray, reduce: str = "mean") -> jnp.ndarray:
    """PVE: mean euclidean vertex error (evaluate/eval.py:208-210)."""
    err = jnp.sqrt(jnp.sum((pred_verts - gt_verts) ** 2, axis=-1)).mean(axis=-1)
    if reduce == "mean":
        return err.mean()
    return err
