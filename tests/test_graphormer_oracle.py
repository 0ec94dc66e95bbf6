"""Graphormer torch-oracle parity (VERDICT round-2 item 7).

Re-declares the reference BERT/GCN refiner in torch from its documented
semantics — `models/bert/modeling_graphormer.py:124-345` (BertSelfAttention/
BertAttention/GraphormerLayer/EncoderBlock/Graphormer) and
`models/bert/_gcnn.py:54-123` (GraphResBlock/GraphLinear/GraphConvolution,
BertLayerNorm eps 1e-12) plus `models/e2e_body_network.py:22-89` — and
asserts the flax GraphormerEncoder / GraphormerBodyNetwork reproduce it at
matched weights to fp32 tolerance (eval mode: dropout off, dense adjacency
fed to both sides).
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


# ---------------------------------------------------------------------------
# torch re-declarations
# ---------------------------------------------------------------------------
class TorchBertSelfAttention(nn.Module):
    """modeling_graphormer.py:25-90 (no mask, eval)."""

    def __init__(self, hidden, heads):
        super().__init__()
        self.heads = heads
        self.head_size = hidden // heads
        self.query = nn.Linear(hidden, hidden)
        self.key = nn.Linear(hidden, hidden)
        self.value = nn.Linear(hidden, hidden)

    def forward(self, x):
        b, n, c = x.shape

        def split(t):
            return t.view(b, n, self.heads, self.head_size).permute(0, 2, 1, 3)

        q, k, v = split(self.query(x)), split(self.key(x)), split(self.value(x))
        scores = torch.matmul(q, k.transpose(-1, -2)) / math.sqrt(self.head_size)
        probs = scores.softmax(dim=-1)
        ctx = torch.matmul(probs, v).permute(0, 2, 1, 3).reshape(b, n, c)
        return ctx


class TorchBertAttention(nn.Module):
    """BertAttention = self + BertSelfOutput (dense -> LN(x + input))."""

    def __init__(self, hidden, heads):
        super().__init__()
        self.self = TorchBertSelfAttention(hidden, heads)
        self.dense = nn.Linear(hidden, hidden)
        self.LayerNorm = nn.LayerNorm(hidden, eps=1e-12)

    def forward(self, x):
        return self.LayerNorm(self.dense(self.self(x)) + x)


class TorchGraphLinear(nn.Module):
    """_gcnn.py:106-123: W (out, in) applied over channels of (B, C, N)."""

    def __init__(self, in_c, out_c):
        super().__init__()
        self.W = nn.Parameter(torch.randn(out_c, in_c) * 0.05)
        self.b = nn.Parameter(torch.randn(out_c) * 0.05)

    def forward(self, x):  # (B, C_in, N)
        return torch.matmul(self.W[None, :], x) + self.b[None, :, None]


class TorchGraphConvolution(nn.Module):
    """_gcnn.py:125-177 with a dense adjacency."""

    def __init__(self, in_f, out_f):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(in_f, out_f) * 0.05)
        self.bias = nn.Parameter(torch.randn(out_f) * 0.05)

    def forward(self, x, adj):  # (B, N, C)
        support = torch.matmul(x, self.weight)
        return torch.matmul(adj, support) + self.bias


class TorchGraphResBlock(nn.Module):
    """_gcnn.py:54-83 (skip_conv is declared in the reference but unused)."""

    def __init__(self, channels):
        super().__init__()
        half = channels // 2
        self.lin1 = TorchGraphLinear(channels, half)
        self.conv = TorchGraphConvolution(half, half)
        self.lin2 = TorchGraphLinear(half, channels)
        self.pre_norm = nn.LayerNorm(channels, eps=1e-12)
        self.norm1 = nn.LayerNorm(half, eps=1e-12)
        self.norm2 = nn.LayerNorm(half, eps=1e-12)

    def forward(self, x, adj):  # (B, N, C)
        y = F.relu(self.pre_norm(x)).transpose(1, 2)
        y = self.lin1(y).transpose(1, 2)
        y = F.relu(self.norm1(y))
        y = self.conv(y, adj)
        y2 = F.relu(self.norm2(y)).transpose(1, 2)
        return x + self.lin2(y2).transpose(1, 2)


class TorchGraphormerLayer(nn.Module):
    """modeling_graphormer.py:124-167 MHA_GCN (graph_conv=True, body)."""

    def __init__(self, hidden, heads):
        super().__init__()
        self.attention = TorchBertAttention(hidden, heads)
        self.graph_conv = TorchGraphResBlock(hidden)
        self.intermediate = nn.Linear(hidden, hidden * 2)
        self.out_dense = nn.Linear(hidden * 2, hidden)
        self.out_ln = nn.LayerNorm(hidden, eps=1e-12)

    def forward(self, x, adj):
        a = self.attention(x)
        verts = self.graph_conv(a[:, :-1], adj)
        jv = torch.cat([verts, a[:, -1:]], dim=1)
        inter = F.gelu(self.intermediate(jv))  # exact erf gelu (_gcnn.py:29-36)
        return self.out_ln(self.out_dense(inter) + jv)


class TorchGraphormer(nn.Module):
    """Graphormer head (modeling_graphormer.py:304-337) + EncoderBlock
    embeddings (:208-300: img_embedding + learned position embeddings)."""

    def __init__(self, in_dim, hidden=32, layers=4, heads=4, out_dim=3, max_pos=512):
        super().__init__()
        self.img_embedding = nn.Linear(in_dim, hidden)
        self.position_embeddings = nn.Embedding(max_pos, hidden)
        self.layer = nn.ModuleList(
            [TorchGraphormerLayer(hidden, heads) for _ in range(layers)]
        )
        self.cls_head = nn.Linear(hidden, out_dim)
        self.residual = nn.Linear(in_dim, out_dim)

    def forward(self, tokens, adj):
        b, n, _ = tokens.shape
        pos = self.position_embeddings(torch.arange(n)).unsqueeze(0)
        x = pos + self.img_embedding(tokens)
        for blk in self.layer:
            x = blk(x, adj)
        return self.cls_head(x) + self.residual(tokens)


class TorchGraphormerBody(nn.Module):
    """e2e_body_network.py:22-89: tokens -> encoder -> 431->1723->6890."""

    def __init__(self, body_dim, tok_dim, **enc_kw):
        super().__init__()
        self.trans_encoder = TorchGraphormer(tok_dim, **enc_kw)
        self.global_feat_dim = nn.Linear(body_dim, tok_dim)
        self.upsampling = nn.Linear(431, 1723)
        self.upsampling2 = nn.Linear(1723, 6890)

    def forward(self, body_feat, grid_feat, temp_verts, adj):
        global_tok = self.global_feat_dim(body_feat)[:, None, :]
        feats = torch.cat([temp_verts, grid_feat], dim=2)
        feats = torch.cat([feats, global_tok], dim=1)
        out = self.trans_encoder(feats, adj)
        pred_temp = out[:, :-1]
        t = pred_temp.transpose(1, 2)
        sub = self.upsampling(t)
        full = self.upsampling2(sub)
        return pred_temp, sub.transpose(1, 2), full.transpose(1, 2)


# ---------------------------------------------------------------------------
# torch state -> flax param tree
# ---------------------------------------------------------------------------
def _lin(m):
    return {"kernel": m.weight.detach().numpy().T, "bias": m.bias.detach().numpy()}


def _ln(m):
    return {"scale": m.weight.detach().numpy(), "bias": m.bias.detach().numpy()}


def encoder_params(t: TorchGraphormer):
    p = {
        "img_embedding": _lin(t.img_embedding),
        "position_embeddings": t.position_embeddings.weight.detach().numpy(),
        "cls_head": _lin(t.cls_head),
        "residual": _lin(t.residual),
    }
    for i, blk in enumerate(t.layer):
        g = blk.graph_conv
        p[f"layer{i}"] = {
            "attn": {
                "query": _lin(blk.attention.self.query),
                "key": _lin(blk.attention.self.key),
                "value": _lin(blk.attention.self.value),
                "out": _lin(blk.attention.dense),
                "ln": _ln(blk.attention.LayerNorm),
            },
            "graph_conv": {
                "pre_norm": _ln(g.pre_norm),
                "norm1": _ln(g.norm1),
                "norm2": _ln(g.norm2),
                "lin1": {"kernel": g.lin1.W.detach().numpy().T,
                         "bias": g.lin1.b.detach().numpy()},
                "conv_w": {"kernel": g.conv.weight.detach().numpy(),
                           "bias": g.conv.bias.detach().numpy()},
                "lin2": {"kernel": g.lin2.W.detach().numpy().T,
                         "bias": g.lin2.b.detach().numpy()},
            },
            "intermediate": _lin(blk.intermediate),
            "output": _lin(blk.out_dense),
            "ln": _ln(blk.out_ln),
        }
    return p


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)


class TestGraphormerOracle:
    def _adj(self):
        from whmr_tpu.data.assets import synthetic_smpl_assets
        from whmr_tpu.models.graphormer import build_adjacency

        return build_adjacency(synthetic_smpl_assets())

    def test_encoder_matches_torch(self):
        import jax
        import jax.numpy as jnp

        from whmr_tpu.models.graphormer import GraphormerEncoder

        in_dim, hidden, heads, layers = 19, 32, 4, 4
        t = TorchGraphormer(in_dim, hidden=hidden, layers=layers, heads=heads).eval()
        _randomize(t, 11)

        adj = self._adj()
        rng = np.random.RandomState(4)
        tokens = rng.randn(2, 432, in_dim).astype(np.float32) * 0.5
        with torch.no_grad():
            ref = t(torch.from_numpy(tokens), torch.from_numpy(adj)).numpy()

        model = GraphormerEncoder(hidden=hidden, num_layers=layers, num_heads=heads)
        out = jax.jit(
            lambda p, x, a: model.apply({"params": p}, x, a, deterministic=True)
        )(encoder_params(t), jnp.asarray(tokens), jnp.asarray(adj))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)

    def test_body_network_matches_torch(self):
        import jax
        import jax.numpy as jnp

        from whmr_tpu.models.graphormer import GraphormerBodyNetwork

        body_dim, grid_c = 37, 16
        tok_dim = 3 + grid_c
        t = TorchGraphormerBody(body_dim, tok_dim).eval()
        _randomize(t, 7)

        adj = self._adj()
        rng = np.random.RandomState(5)
        body_feat = rng.randn(2, body_dim).astype(np.float32) * 0.5
        grid_feat = rng.randn(2, 431, grid_c).astype(np.float32) * 0.5
        temp_verts = rng.randn(2, 431, 3).astype(np.float32) * 0.3
        with torch.no_grad():
            r_temp, r_sub, r_full = t(
                torch.from_numpy(body_feat),
                torch.from_numpy(grid_feat),
                torch.from_numpy(temp_verts),
                torch.from_numpy(adj),
            )

        params = {
            "global_feat_dim": _lin(t.global_feat_dim),
            "upsampling": _lin(t.upsampling),
            "upsampling2": _lin(t.upsampling2),
            "trans_encoder": encoder_params(t.trans_encoder),
        }
        model = GraphormerBodyNetwork()
        out = jax.jit(
            lambda p, b, g, v, a: model.apply({"params": p}, b, g, v, a, train=False)
        )(
            params,
            jnp.asarray(body_feat),
            jnp.asarray(grid_feat),
            jnp.asarray(temp_verts),
            jnp.asarray(adj),
        )
        np.testing.assert_allclose(
            np.asarray(out["temp_verts"]), r_temp.numpy(), atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["sub_verts"]), r_sub.numpy(), atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["verts"]), r_full.numpy(), atol=1e-4, rtol=1e-4
        )
