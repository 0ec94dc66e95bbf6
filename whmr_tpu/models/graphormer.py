"""Graphormer non-parametric vertex refiner.

Port target: reference `models/e2e_body_network.py` (Graphormer_Body_Network
:22-150) + `models/bert/modeling_graphormer.py` (Graphormer :304,
EncoderBlock :208, GraphormerLayer :124) + `models/bert/_gcnn.py`
(GraphResBlock :54, GraphConvolution :123).

Architecture: tokens = [431 coarse mesh vertices ⊕ their grid-sampled image
features (3+256=259-d)] + one global token (projected body feature) -> BERT
post-LN encoder (4 layers, hidden 32, 4 heads) whose vertex tokens pass
through a GraphResBlock (GCN over the 431-vertex adjacency — a dense
431x431 matmul on TPU) -> 3-d residual head -> per-vertex coordinates,
linearly upsampled 431 -> 1723 -> 6890.

NOTE: this branch is DEAD CODE in the shipped reference — `self.transformer`
is built for `range(3, N_ITER)` under an `assert N_ITER <= 3` (whmr.py:363,
537), and its invocation is commented out (whmr.py:613-626). It is
implemented here as a first-class optional refinement stage (capability
surface parity + the paper's full architecture).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from whmr_tpu.data.assets import SMPLAssets


def build_adjacency(assets: SMPLAssets, path: Optional[str] = None) -> np.ndarray:
    """431-vertex normalized adjacency.

    Loads the reference's sparse adjmat tensors when given
    (data/smpl_431_adjmat_{indices,values,size}.pt, _gcnn.py:132-138) or
    derives a ring adjacency over the coarse vertex ordering from the
    synthetic downsampling structure.
    """
    if path is not None:
        import torch

        idx = torch.load(f"{path}/smpl_431_adjmat_indices.pt")
        val = torch.load(f"{path}/smpl_431_adjmat_values.pt")
        size = torch.load(f"{path}/smpl_431_adjmat_size.pt")
        adj = np.zeros(tuple(size), np.float32)
        adj[idx[0].numpy(), idx[1].numpy()] = val.numpy()
        return adj
    n = assets.dmap1.shape[0]
    adj = np.eye(n, dtype=np.float32)
    for off in (1, 2):
        adj += np.eye(n, k=off, dtype=np.float32) + np.eye(n, k=-off, dtype=np.float32)
    return adj / adj.sum(axis=1, keepdims=True)


class BertSelfAttention(nn.Module):
    """Post-LN BERT attention block (modeling_graphormer BertAttention).

    Dropout sites and rates follow the reference BERT config (whmr.py:370
    sets hidden_dropout_prob=0.1; attention_probs_dropout_prob is the
    bert-base default 0.1): on the attention probabilities and on the
    projected output before the residual."""

    num_heads: int
    dtype: Any = jnp.float32
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic=True):
        b, n, c = x.shape
        head = c // self.num_heads
        q = nn.Dense(c, dtype=self.dtype, name="query")(x)
        k = nn.Dense(c, dtype=self.dtype, name="key")(x)
        v = nn.Dense(c, dtype=self.dtype, name="value")(x)

        def split(t):
            return t.reshape(b, n, self.num_heads, head)

        attn = jnp.einsum("bnhd,bmhd->bhnm", split(q) / jnp.sqrt(head).astype(x.dtype), split(k))
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        ctx = jnp.einsum("bhnm,bmhd->bnhd", attn, split(v)).reshape(b, n, c)
        out = nn.Dense(c, dtype=self.dtype, name="out")(ctx)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="ln")(out + x)


class GraphResBlock(nn.Module):
    """GCN bottleneck residual block over the vertex tokens (_gcnn.py:54-83)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, adj):
        half = self.channels // 2
        y = nn.relu(nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="pre_norm")(x))
        y = nn.Dense(half, dtype=self.dtype, name="lin1")(y)
        y = nn.relu(nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="norm1")(y))
        # GCN: adj (V, V) x tokens (B, V, C) x weight — dense matmul on MXU.
        y = jnp.einsum("uv,bvc->buc", adj, y)
        y = nn.Dense(half, use_bias=True, dtype=self.dtype, name="conv_w")(y)
        y = nn.relu(nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="norm2")(y))
        y = nn.Dense(self.channels, dtype=self.dtype, name="lin2")(y)
        return x + y


class GraphormerLayer(nn.Module):
    num_heads: int
    intermediate: int
    graph_conv: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, adj, deterministic=True):
        c = x.shape[-1]
        x = BertSelfAttention(self.num_heads, dtype=self.dtype, name="attn")(x, deterministic)
        if self.graph_conv:
            # GCN only over the vertex tokens; the trailing global token
            # bypasses (modeling_graphormer.py:142-158).
            verts = GraphResBlock(c, dtype=self.dtype, name="graph_conv")(x[:, :-1], adj)
            x = jnp.concatenate([verts, x[:, -1:]], axis=1)
        y = nn.Dense(self.intermediate, dtype=self.dtype, name="intermediate")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="output")(y)
        # BertOutput hidden dropout (reference hidden_dropout_prob=0.1).
        y = nn.Dropout(0.1, deterministic=deterministic)(y)
        return nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="ln")(x + y)


class GraphormerEncoder(nn.Module):
    """EncoderBlock + Graphormer head (img embed + learned pos embed ->
    4 layers -> cls_head + input residual)."""

    hidden: int = 32
    num_layers: int = 4
    num_heads: int = 4
    out_dim: int = 3
    graph_conv: bool = True
    max_tokens: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, adj, deterministic=True):
        b, n, in_dim = tokens.shape
        x = nn.Dense(self.hidden, dtype=self.dtype, name="img_embedding")(tokens)
        pos = self.param(
            "position_embeddings",
            nn.initializers.normal(0.02),
            (self.max_tokens, self.hidden),
        )
        x = x + pos[None, :n].astype(x.dtype)
        # BertEmbeddings hidden dropout (reference hidden_dropout_prob=0.1).
        x = nn.Dropout(0.1, deterministic=deterministic)(x)
        for i in range(self.num_layers):
            x = GraphormerLayer(
                self.num_heads, self.hidden * 2, self.graph_conv,
                dtype=self.dtype, name=f"layer{i}",
            )(x, adj, deterministic)
        out = nn.Dense(self.out_dim, dtype=self.dtype, name="cls_head")(x)
        res = nn.Dense(self.out_dim, dtype=self.dtype, name="residual")(tokens)
        return out + res


class GraphormerBodyNetwork(nn.Module):
    """Full refinement stage (e2e_body_network.py:44-150 forward).

    Inputs: body_feat (global feature), per-vertex grid features from the
    MAF sampling of the 431 coarse vertices, the coarse vertices themselves.
    Output: refined vertices at 431 / 1723 / 6890 resolution.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        body_feat: jnp.ndarray,      # (B, D)
        grid_feat: jnp.ndarray,      # (B, 431, C)
        temp_verts: jnp.ndarray,     # (B, 431, 3)
        adj: jnp.ndarray,            # (431, 431)
        meta_masks: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        global_tok = nn.Dense(
            temp_verts.shape[-1] + grid_feat.shape[-1],
            dtype=self.dtype, name="global_feat_dim",
        )(body_feat)[:, None, :]
        vert_tok = jnp.concatenate([temp_verts.astype(self.dtype), grid_feat], axis=-1)
        tokens = jnp.concatenate([vert_tok, global_tok], axis=1)  # (B, 432, 259)

        if train and meta_masks is not None:
            # masked vertex modeling: [MASK] token = 0.01s (e2e:66-70)
            special = jnp.full_like(tokens[:, :-1], 0.01)
            masked = tokens[:, :-1] * meta_masks + special * (1 - meta_masks)
            tokens = jnp.concatenate([masked, tokens[:, -1:]], axis=1)

        out = GraphormerEncoder(dtype=self.dtype, name="trans_encoder")(
            tokens, adj, deterministic=not train
        )
        pred_temp = out[:, :-1]  # (B, 431, 3)

        # Linear mesh upsampling across the VERTEX axis (e2e:82-89).
        t = jnp.swapaxes(pred_temp, 1, 2)  # (B, 3, 431)
        sub = nn.Dense(1723, dtype=self.dtype, name="upsampling")(t)
        full = nn.Dense(6890, dtype=self.dtype, name="upsampling2")(sub)
        return {
            "temp_verts": pred_temp,
            "sub_verts": jnp.swapaxes(sub, 1, 2),
            "verts": jnp.swapaxes(full, 1, 2),
        }
