"""Shared flax.linen building blocks (NHWC, bf16-compute friendly).

TPU conventions used throughout the model zoo:
- NHWC layouts (channels on the 128-lane axis) — never the reference's NCHW.
- `dtype` is the compute dtype (bf16 by default in the full model) while
  params stay fp32; flax promotes automatically.
- BatchNorm carries running statistics and supports cross-replica sync via
  `axis_name` — the mesh-native replacement for the reference's
  SyncBatchNorm conversion (core/trainer.py:83).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class ConvBN(nn.Module):
    """Conv -> BatchNorm -> optional ReLU."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    use_relu: bool = True
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            axis_name=self.bn_axis_name if train else None,
            dtype=self.dtype,
        )(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class Bottleneck(nn.Module):
    """ResNet bottleneck block (reference models/hmr.py:15-54 topology)."""

    planes: int
    strides: Tuple[int, int] = (1, 1)
    downsample: bool = False
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = ConvBN(self.planes, (1, 1), dtype=self.dtype, bn_axis_name=self.bn_axis_name)(x, train)
        # Explicit symmetric padding, NOT "SAME": for the stride-2 stage
        # entries XLA SAME pads (0, 1) on even inputs while torch
        # Conv2d(3, stride=2, padding=1) pads (1, 1) — every window would
        # be shifted one pixel and converted reference checkpoints would
        # see shifted feature maps (stride-1 blocks are unaffected:
        # SAME == (1, 1) there). Same reason the stem conv/pool above
        # spell out their padding.
        y = ConvBN(
            self.planes, (3, 3), strides=self.strides,
            padding=[(1, 1), (1, 1)], dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
        )(y, train)
        y = ConvBN(
            self.planes * 4, (1, 1), use_relu=False, dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
        )(y, train)
        if self.downsample:
            residual = ConvBN(
                self.planes * 4, (1, 1), strides=self.strides, use_relu=False,
                dtype=self.dtype, bn_axis_name=self.bn_axis_name,
            )(x, train)
        return nn.relu(y + residual)


class ResNetTrunk(nn.Module):
    """ResNet-50 trunk: stem + 4 stages, returns the stage-4 feature map.

    Topology matches torchvision resnet50 as used by all three reference
    backbones (hmr.py:57-161, pose_resnet.py:103-277, pare's CamCalib
    backbone cam_model.py:33).
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            dtype=self.dtype, bn_axis_name=self.bn_axis_name,
        )(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, (n_blocks, planes) in enumerate(zip(self.layers, (64, 128, 256, 512))):
            for block in range(n_blocks):
                strides = (2, 2) if (block == 0 and stage > 0) else (1, 1)
                x = Bottleneck(
                    planes,
                    strides=strides,
                    downsample=(block == 0),
                    dtype=self.dtype,
                    bn_axis_name=self.bn_axis_name,
                )(x, train)
        return x


class MLP(nn.Module):
    """Transformer MLP: Linear -> GELU -> Linear (vendored vit.py:60-75)."""

    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out, dtype=self.dtype)(x)
        return x


class Attention(nn.Module):
    """Multi-head self-attention, fused-qkv (vendored vit.py:77-115).

    Sequence lengths in this model family are tiny (5-432 tokens) so a plain
    einsum softmax attention fuses well under XLA; no flash kernel needed
    (SURVEY.md §5 'long-context: not present and not needed').

    `impl` selects the inner attention formulation (parity-tested against
    each other in tests/test_attention_pallas.py; perf on v5e recorded in
    scripts/bench_attn.py):
    - "einsum": scores straight from the (B, N, H, D) qkv slices.
    - "bhnd": transpose q/k/v to (B, H, N, D) first, then clean batched
      matmuls — isolates layout cost from matmul cost.
    - "xla_dpa": jax.nn.dot_product_attention (XLA's fused path).
    - "pallas": head-batched fused kernel (ops/attention_pallas.py).
    """

    num_heads: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32
    impl: str = "einsum"

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        head_dim = c // self.num_heads
        scale = head_dim**-0.5
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        if self.impl in ("split", "bf16sm"):
            # Contiguous-lane split of the fused qkv projection (same
            # element order as the 5D reshape: 3 outer, then H, then D).
            q = qkv[..., :c].reshape(b, n, self.num_heads, head_dim)
            k = qkv[..., c:2 * c].reshape(b, n, self.num_heads, head_dim)
            v = qkv[..., 2 * c:].reshape(b, n, self.num_heads, head_dim)
            attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
            if self.impl == "split":
                attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
            else:
                attn = nn.softmax(attn, axis=-1)  # compute-dtype softmax
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
            return nn.Dense(c, dtype=self.dtype, name="proj")(out)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, D)
        if self.impl == "einsum":
            attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
            attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        elif self.impl in ("bhnd", "bhnd_bf16sm"):
            qt, kt, vt = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
            attn = jnp.einsum("bhnd,bhmd->bhnm", qt * scale, kt)
            if self.impl == "bhnd":
                attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
            else:
                attn = nn.softmax(attn, axis=-1)  # compute-dtype softmax
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, vt)
            out = jnp.swapaxes(out, 1, 2).reshape(b, n, c)
        elif self.impl == "xla_dpa":
            out = jax.nn.dot_product_attention(q, k, v).reshape(b, n, c)
        elif self.impl == "pallas":
            from whmr_tpu.ops.attention_pallas import fused_attention_heads

            qt, kt, vt = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
            out = fused_attention_heads(
                qt, kt, vt, interpret=jax.default_backend() == "cpu"
            )
            out = jnp.swapaxes(out, 1, 2).reshape(b, n, c)
        else:
            raise ValueError(f"unknown attention impl {self.impl!r}")
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class TransformerBlock(nn.Module):
    """Pre-LN transformer block (vendored vit.py:117-141; also the timm
    Block used by the Tz head, reference whmr.py:409,423)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    # LN epsilon: the mmpose ViT pins 1e-6 (vit.py:212); a BARE timm Block
    # (the Tz head, whmr.py:423) defaults to nn.LayerNorm's 1e-5.
    ln_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm1")(x)
        x = x + Attention(self.num_heads, self.qkv_bias, dtype=self.dtype, name="attn")(y)
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm2")(x)
        x = x + MLP(int(c * self.mlp_ratio), c, dtype=self.dtype, name="mlp")(y)
        return x


class DeconvBlock(nn.Module):
    """ConvTranspose(k4 s2) + BN + ReLU — one pyramid upsampling step
    (reference whmr.py:459-501, Simple Baselines deconv)."""

    features: int
    kernel: int = 4
    use_bias: bool = False
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(
            self.features,
            (self.kernel, self.kernel),
            strides=(2, 2),
            padding="SAME",
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            axis_name=self.bn_axis_name if train else None,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)
