"""Auxiliary heads: Tz/focal transformer head, IUV head, depth head.

Reference counterparts:
- Tz head: whmr.py:404-430 (arch) / :566-577 (forward) — conv stack to 5
  token maps, one transformer block over the 5 tokens, average-pool, tiny
  MLP + BatchNorm + sigmoid, scaled by 10.
- IUV head: models/iuv_predictor.py:14-91 — four 3x3 convs on the 256-ch
  pyramid output predicting DensePose-style U(25)/V(25)/part-index(25)/
  ann-index(15) maps.
- Depth head: models/depth_predictor.py:12-27 — one 3x3 conv to a 1-ch
  inverse-depth map.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from whmr_tpu.models.layers import TransformerBlock


class TzHead(nn.Module):
    """(B, H, W, 256) pyramid feature -> (B,) body depth Tz in (0, 10).

    vitpose variant (whmr.py:417-430): Conv(256->64, k7 s3) -> Conv(64->5,
    k7 s2) -> 5 tokens of dim Hp*Wp -> timm Block(num_heads=2) -> mean over
    tokens -> Linear -> Linear -> BatchNorm -> sigmoid -> x10.

    res50 variant uses stride 2 in the first conv (whmr.py:404-416); the
    token dim adapts automatically to the incoming spatial size.
    """

    first_stride: int = 3  # 3 for vitpose (whmr.py:419), 2 for res50 (:406)
    hidden: int = 12  # est_Tz Linear width: 12 vitpose (:426), 10 res50 (:412)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            64, (7, 7), strides=(self.first_stride, self.first_stride),
            padding="VALID", use_bias=False, dtype=self.dtype, name="conv1",
        )(feat)
        x = nn.Conv(
            5, (7, 7), strides=(2, 2), padding="VALID", use_bias=False,
            dtype=self.dtype, name="conv2",
        )(x)
        b, h, w, _ = x.shape
        # tokens: 5 channels, each an h*w-dim token (whmr.py:571).
        x = x.reshape(b, h * w, 5).transpose(0, 2, 1)  # (B, 5, h*w)
        x = TransformerBlock(
            num_heads=2, qkv_bias=False, ln_eps=1e-5, dtype=self.dtype,
            name="decoder",
        )(x)
        x = jnp.mean(x, axis=1)  # AvgPool1d(k=5) over the token axis (:575)
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.Dense(1, dtype=self.dtype, name="fc2")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype,
            name="bn",
        )(x)
        return 10.0 * nn.sigmoid(x)[:, 0]


class IUVHead(nn.Module):
    """Dense IUV prediction maps for auxiliary supervision."""

    with_uv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> Dict[str, Optional[jnp.ndarray]]:
        def head(ch, name):
            return nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype, name=name)(feat)

        out: Dict[str, Optional[jnp.ndarray]] = {
            "predict_uv_index": head(25, "predict_uv_index"),
            "predict_ann_index": head(15, "predict_ann_index"),
        }
        if self.with_uv:
            out["predict_u"] = head(25, "predict_u")
            out["predict_v"] = head(25, "predict_v")
        else:
            out["predict_u"] = None
            out["predict_v"] = None
        return out


class DepthHead(nn.Module):
    """One-channel inverse-depth map head."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype, name="predict_depth")(feat)
