"""DensePose IUV codec: IUV image (3ch) <-> one-hot part/U/V/Ann map stacks.

Equivalent of reference `utils/iuvmap.py` (iuv_img2map :67, iuv_map2img :5)
in NHWC and fully batched/vectorized — the reference's per-part python loops
and per-batch cuda loops become one-hot masks computed with broadcasting.

Conventions (identical to the reference):
- IUV image channel 0 encodes the part index scaled by 1/24 (25 parts incl.
  background), channels 1-2 are the U/V coordinates.
- The 15-way "annotation index" groups the 25 parts per the DensePose
  Index2mask table.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

# DensePose 25-part -> 15-annotation grouping (iuvmap.py:74-75).
INDEX2MASK = [
    [0], [1, 2], [3], [4], [5], [6], [7, 9], [8, 10], [11, 13], [12, 14],
    [15, 17], [16, 18], [19, 21], [20, 22], [23, 24],
]

_ANN_MATRIX = np.zeros((25, 15), np.float32)
for ann_i, parts in enumerate(INDEX2MASK):
    for p in parts:
        _ANN_MATRIX[p, ann_i] = 1.0


def iuv_img2map(iuv_images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(B, H, W, 3) IUV image -> one-hot map stacks.

    Returns dict with 'u' (B,H,W,25), 'v' (B,H,W,25), 'index' (B,H,W,25
    soft one-hot), 'ann' (B,H,W,15). Matches iuv_img2map (iuvmap.py:67-110):
    part channel is rounded to the nearest index; U/V are masked per part.
    """
    part_ind = jnp.round(iuv_images[..., 0] * 24.0)  # (B, H, W)
    part_u = iuv_images[..., 1]
    part_v = iuv_images[..., 2]

    ids = jnp.arange(25, dtype=part_ind.dtype)
    onehot = (part_ind[..., None] == ids).astype(iuv_images.dtype)  # (B,H,W,25)
    u = onehot * part_u[..., None]
    v = onehot * part_v[..., None]
    ann = onehot @ jnp.asarray(_ANN_MATRIX, iuv_images.dtype)  # (B,H,W,15)
    return {"u": u, "v": v, "index": onehot, "ann": ann}


def iuv_map2img(
    u_map: jnp.ndarray,
    v_map: jnp.ndarray,
    index_map: jnp.ndarray,
    ann_map: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One-hot/logit map stacks (B, H, W, C) -> (B, H, W, 3) IUV image.

    Matches iuv_map2img (iuvmap.py:5-37): the argmax part picks the U/V
    channels; part 0 (background) gets zeros; optional ann gating.
    """
    k = index_map.shape[-1]
    idx = jnp.argmax(index_map, axis=-1)  # (B, H, W)
    if ann_map is not None:
        ann_idx = jnp.argmax(ann_map, axis=-1)
        idx = idx * (ann_idx > 0).astype(idx.dtype)
    onehot = jax_one_hot(idx, k, u_map.dtype)
    u = jnp.sum(onehot * u_map, axis=-1)
    v = jnp.sum(onehot * v_map, axis=-1)
    i = idx.astype(u_map.dtype) / float(k - 1)
    return jnp.stack([i, u, v], axis=-1)


def jax_one_hot(idx: jnp.ndarray, k: int, dtype) -> jnp.ndarray:
    ids = jnp.arange(k, dtype=idx.dtype)
    return (idx[..., None] == ids).astype(dtype)
