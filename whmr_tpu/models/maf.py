"""Mesh-aligned feature (MAF) extractor.

Re-implements the reference MAF_Extractor (models/maf_extractor.py:17-143):
project 3D mesh markers through the current weak-perspective camera, sample
the spatial feature map bilinearly at the projected points, and reduce the
per-point channels with a skip-concat 1x1-conv MLP (MLP_DIM [256,128,64,32]).

TPU shape: per-point 1x1 convs are plain Dense layers applied over the point
axis; the bilinear sampling is the lane-contiguous gather from
ops.grid_sample. Everything stays inside the jit graph.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from whmr_tpu.ops.camera import weak_perspective_projection
from whmr_tpu.ops.grid_sample import grid_sample_2d


class MAFExtractor(nn.Module):
    """Point-feature pooling + reduction MLP.

    mlp_dim follows reference cfg.MODEL.PyMAF.MLP_DIM (pymaf_config.yaml:36):
    filters are [256->128, (128+256)->64, (64+256)->32] with leaky-relu
    between and ReLU at the end (maf_extractor.py:33-46, 75-101).
    """

    mlp_dim: Sequence[int] = (256, 128, 64, 32)
    img_res: Tuple[int, int] = (256, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def reduce_dim(self, point_feat: jnp.ndarray) -> jnp.ndarray:
        """(B, N, C0) -> (B, N*C_last) flattened reduced features."""
        y = point_feat
        skip = point_feat
        n_layers = len(self.mlp_dim) - 1
        for i in range(n_layers):
            inp = y if i == 0 else jnp.concatenate([y, skip], axis=-1)
            y = nn.Dense(self.mlp_dim[i + 1], dtype=self.dtype, name=f"conv{i}")(inp)
            if i != n_layers - 1:
                y = nn.leaky_relu(y, negative_slope=0.01)
        y = nn.relu(y)
        b = y.shape[0]
        # Flatten CHANNEL-major, matching the reference's (B, C_p, N) .view
        # (maf_extractor.py:100): converted regressor/global-orient fc1
        # weights index features as c*N + n, so the flatten order is part of
        # the checkpoint format. The (B, N, C) -> (B, C, N) transpose is a
        # tiny layout op XLA fuses away (found by the full-graph torch-oracle
        # parity test, tests/test_parity_full_graph.py).
        return y.transpose(0, 2, 1).reshape(b, -1)

    def sampling(
        self, im_feat: jnp.ndarray, points: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Sample `im_feat` (B, H, W, C) at normalized points (B, N, 2).

        Returns (reduced (B, N*C_last), raw point features (B, N, C)).
        Matches maf_extractor.py:103-124 with align_corners=True semantics.
        """
        point_feat = grid_sample_2d(im_feat, points)
        return self.reduce_dim(point_feat), point_feat

    def __call__(
        self, im_feat: jnp.ndarray, points_3d: jnp.ndarray, cam: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Project markers with the weak-persp camera and pool features.

        Matches maf_extractor.py:126-143 (`forward`): p -> projection(p, cam)
        -> sampling. The full-image `project` variant (maf_extractor.py:145-185)
        is dead code in the reference forward and intentionally not ported.
        """
        p2d = weak_perspective_projection(points_3d, cam, self.img_res)
        return self.sampling(im_feat, p2d.astype(im_feat.dtype))
