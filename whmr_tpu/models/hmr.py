"""Plain HMR baseline: ResNet-50 + iterative rot6d SMPL regressor.

Reference `models/hmr.py:164-277` (SPIN-style HMR, selectable via
`--regressor hmr`, core/trainer.py:407-409): global-pooled backbone feature,
3 refinement iterations over [feat | θ(6d) | β | cam], rot6d -> rotmat.
Kept as the simple single-shot baseline beside the MAF model.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from whmr_tpu.models.regressor import BodyConsts, _xavier_gain
from whmr_tpu.models.resnet import ResNetBackbone
from whmr_tpu.ops.rotation import rot6d_to_rotmat


class HMR(nn.Module):
    """(B, H, W, 3) -> (rotmat (B,24,3,3), betas (B,10), cam (B,3))."""

    n_iter: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, consts: BodyConsts, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        b = x.shape[0]
        _, feat = ResNetBackbone(dtype=self.dtype, name="backbone")(x, train=train)

        # Mean init in rot6d (hmr.py:186-192): take the first two rotmat
        # columns of the mean pose.
        mean_rotmat = consts.mean_pose.reshape(1, 24, 3, 3)
        init_pose = mean_rotmat[..., :2].reshape(1, 24 * 6)
        pred_pose = jnp.broadcast_to(init_pose, (b, 144)).astype(feat.dtype)
        pred_shape = jnp.broadcast_to(consts.mean_shape, (b, 10)).astype(feat.dtype)
        pred_cam = jnp.broadcast_to(consts.mean_cam, (b, 3)).astype(feat.dtype)

        fc1 = nn.Dense(1024, dtype=self.dtype, name="fc1")
        fc2 = nn.Dense(1024, dtype=self.dtype, name="fc2")
        decpose = nn.Dense(144, dtype=self.dtype, name="decpose", kernel_init=_xavier_gain(0.01))
        decshape = nn.Dense(10, dtype=self.dtype, name="decshape", kernel_init=_xavier_gain(0.01))
        deccam = nn.Dense(3, dtype=self.dtype, name="deccam", kernel_init=_xavier_gain(0.01))
        drop = nn.Dropout(0.5, deterministic=not train)

        for _ in range(self.n_iter):
            xc = jnp.concatenate([feat, pred_pose, pred_shape, pred_cam], axis=1)
            xc = drop(fc1(xc))
            xc = drop(fc2(xc))
            pred_pose = decpose(xc) + pred_pose
            pred_shape = decshape(xc) + pred_shape
            pred_cam = deccam(xc) + pred_cam

        pred_rotmat = rot6d_to_rotmat(pred_pose).reshape(b, 24, 3, 3)
        return pred_rotmat, pred_shape, pred_cam
