"""ViTPose-style ViT backbone (the flagship W-HMR encoder).

Re-implements the vendored mmpose ViT (reference
models/ViTPose/mmpose/models/backbones/vit.py:200-341) as flax.linen, NHWC:

- Padded patch embed: Conv k16 s16 pad4 -> 16x12 tokens at 256x192 input
  (vit.py:158; config ViTPose_base_coco_256x192.py:43-57).
- Learned pos embed with a cls slot, added as `x + pos[1:] + pos[:1]`
  (vit.py:317-320 — the cls row is folded into every token).
- 12 pre-LN blocks, qkv_bias=True, final LayerNorm, reshaped back to a
  spatial (B, Hp, Wp, C) map.

Stochastic depth (drop_path 0.3 in the reference training config) is
implemented as per-sample residual scaling under a `deterministic` flag.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from whmr_tpu.config import ViTConfig
from whmr_tpu.models.layers import Attention, MLP


class DropPath(nn.Module):
    """Per-sample stochastic depth (vendored vit.py:47-58)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        # Unbiased Bernoulli in fp32 (a compute-dtype floor(keep + u) would
        # quantize the draw to bf16 and skew the keep probability).
        import jax

        mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
        return x / keep * mask


class ViTBlock(nn.Module):
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool
    drop_path: float
    dtype: Any = jnp.float32
    attn_impl: str = "einsum"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = Attention(
            self.num_heads, self.qkv_bias, dtype=self.dtype,
            impl=self.attn_impl, name="attn",
        )(y)
        x = x + DropPath(self.drop_path)(y, deterministic)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = MLP(int(c * self.mlp_ratio), c, dtype=self.dtype, name="mlp")(y)
        return x + DropPath(self.drop_path)(y, deterministic)


class ViTBackbone(nn.Module):
    """(B, H, W, 3) image -> (B, Hp, Wp, embed_dim) spatial features."""

    cfg: ViTConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        pad = c.patch_padding
        x = nn.Conv(
            c.embed_dim,
            (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding=[(pad, pad), (pad, pad)],
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        b, hp, wp, _ = x.shape
        x = x.reshape(b, hp * wp, c.embed_dim)

        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, hp * wp + 1, c.embed_dim),
        ).astype(self.dtype)
        # cls-slot folding, matching vit.py:317-320.
        x = x + pos[:, 1:] + pos[:, :1]

        drop_rates = [
            c.drop_path_rate * i / max(c.depth - 1, 1) for i in range(c.depth)
        ]
        block_cls = ViTBlock
        if c.remat:
            # Per-block rematerialization: backward recomputes activations
            # instead of storing depth x (B, N, C) — the memory knob for
            # ViT-L/H training.
            block_cls = nn.remat(ViTBlock, static_argnums=(2,))
        for i in range(c.depth):
            x = block_cls(
                num_heads=c.num_heads,
                mlp_ratio=c.mlp_ratio,
                qkv_bias=c.qkv_bias,
                drop_path=drop_rates[i],
                dtype=self.dtype,
                attn_impl=c.attn_impl,
                name=f"block{i}",
            )(x, not train)

        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="last_norm")(x)
        return x.reshape(b, hp, wp, c.embed_dim)
