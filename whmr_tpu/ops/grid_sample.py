"""Bilinear point sampling from feature maps (grid_sample equivalent).

The reference's MAF step pools features at projected mesh points with
`F.grid_sample(im_feat, points, align_corners=True)` (maf_extractor.py:117-121).
This module provides the exact align_corners=True, zero-padding semantics as a
TPU-friendly gather:

- Feature maps are NHWC (the native TPU/XLA layout; channels ride the 128-wide
  lane dimension).
- The map is flattened to (B, H*W, C) and the four bilinear corners become row
  gathers via `take_along_axis` — a contiguous-lane gather XLA lowers well,
  instead of a scatter/gather over strided NCHW memory.
- Out-of-bounds corners contribute zero (torch padding_mode='zeros'), done by
  weight masking rather than index clamping alone.

Point count per call is tiny (63-67), so this op is bandwidth-trivial; the
value of the formulation is that it fuses into the surrounding jit graph with
no host sync and no dynamic shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_2d(feat: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Sample `feat` at normalized points, bilinear, align_corners=True.

    Args:
      feat: (B, H, W, C) feature maps.
      points: (B, N, 2) xy coordinates in [-1, 1] (x indexes W, y indexes H —
        torch grid_sample convention).

    Returns:
      (B, N, C) sampled features.
    """
    b, h, w, c = feat.shape
    n = points.shape[1]
    dtype = feat.dtype

    x = points[..., 0].astype(jnp.float32)
    y = points[..., 1].astype(jnp.float32)
    # align_corners=True: -1 -> 0, +1 -> size-1.
    fx = (x + 1.0) * 0.5 * (w - 1)
    fy = (y + 1.0) * 0.5 * (h - 1)

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = fx - x0
    wx0 = 1.0 - wx1
    wy1 = fy - y0
    wy0 = 1.0 - wy1

    def corner(xi, yi, wxi, wyi):
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat_idx = yi_c * w + xi_c  # (B, N)
        gathered = jnp.take_along_axis(
            feat.reshape(b, h * w, c), flat_idx[..., None], axis=1
        )  # (B, N, C)
        weight = (wxi * wyi * inb.astype(jnp.float32))[..., None]
        return gathered.astype(jnp.float32) * weight

    out = (
        corner(x0, y0, wx0, wy0)
        + corner(x1, y0, wx1, wy0)
        + corner(x0, y1, wx0, wy1)
        + corner(x1, y1, wx1, wy1)
    )
    return out.astype(dtype)
