"""ResNet-family backbones: SPIN encoder, PoseResNet encoder, CamCalib net.

Covers three reference components with one shared trunk (layers.ResNetTrunk):
- `ResNetBackbone` — SPIN-style encoder returning (spatial 2048-ch map,
  global pooled vector) (reference models/hmr.py:57-161).
- `PoseResNetEncoder` — COCO-pose ResNet50, feature-map-only variant used in
  the res50 PyMAF mode (reference models/pose_resnet.py:103-305; the deconv
  head lives in the WHMR pyramid, not here).
- `CamCalibNet` — full-image camera calibration: ResNet50 -> global pool ->
  three 256-bin heads for vfov/pitch/roll (reference models/cam_model.py:24-81,
  weights `camcalib_sa_biased_l2.ckpt` loaded at whmr.py:437-438).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from whmr_tpu.models.layers import ResNetTrunk


class ResNetBackbone(nn.Module):
    """(B, H, W, 3) -> ((B, H/32, W/32, 2048) spatial, (B, 2048) global)."""

    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        feat = ResNetTrunk(
            dtype=self.dtype, bn_axis_name=self.bn_axis_name, name="trunk"
        )(x, train)
        pooled = jnp.mean(feat, axis=(1, 2))
        return feat, pooled


class PoseResNetEncoder(nn.Module):
    """(B, H, W, 3) -> (B, H/32, W/32, 2048) spatial feature map."""

    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        return ResNetTrunk(
            dtype=self.dtype, bn_axis_name=self.bn_axis_name, name="trunk"
        )(x, train)


class CamCalibNet(nn.Module):
    """Full-image (B, H, W, 3) -> (vfov, pitch, roll) 256-bin logits + feature.

    Head layout matches cam_model.py:40-52 (num_fc_layers=1: one Linear per
    angle, 2048 -> 256).
    """

    num_bins: int = 256
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ResNetTrunk(
            dtype=self.dtype, bn_axis_name=self.bn_axis_name, name="trunk"
        )(x, train)
        pooled = jnp.mean(feat, axis=(1, 2))  # AdaptiveAvgPool2d((1,1))
        vfov = nn.Dense(self.num_bins, dtype=self.dtype, name="fc_vfov")(pooled)
        pitch = nn.Dense(self.num_bins, dtype=self.dtype, name="fc_pitch")(pooled)
        roll = nn.Dense(self.num_bins, dtype=self.dtype, name="fc_roll")(pooled)
        return (vfov, pitch, roll), pooled
