"""Composed module-level parity vs live torch oracles.

These close the checkpoint-parity loop above the per-layer conversion tests
(test_convert.py): whole reference modules are re-declared in torch from the
reference's documented semantics (NOT imported or copied), their
state_dicts run through the real converter, and the flax modules must
reproduce the torch outputs to fp32 tolerance.

Oracles:
- 2-block ViT backbone (vendored mmpose vit.py:200-341 semantics: padded
  patch embed, cls-folded pos embed, pre-LN blocks, last_norm)
- full Regressor MLP step (whmr.py:102-130: concat order, no-activation
  MLP, residual decoders, eval-time unbiased Gram-Schmidt)
- Tz head (whmr.py:417-430: VALID-conv token stack, timm Block with
  qkv_bias=False, est_Tz Linear/Linear/BN1d/sigmoid x10)
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


# ---------------------------------------------------------------------------
# torch re-declarations (reference semantics, written fresh for the oracle)
# ---------------------------------------------------------------------------
class TorchAttention(nn.Module):
    def __init__(self, dim, num_heads, qkv_bias=True):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.num_heads, c // self.num_heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)  # (3, B, H, N, D)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(out)


class TorchMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class TorchBlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=True, eps=1e-6):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=eps)
        self.attn = TorchAttention(dim, num_heads, qkv_bias)
        self.norm2 = nn.LayerNorm(dim, eps=eps)
        self.mlp = TorchMlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class TorchPatchEmbed(nn.Module):
    def __init__(self, embed_dim, patch=16, pad=4):
        super().__init__()
        self.proj = nn.Conv2d(3, embed_dim, patch, stride=patch, padding=pad)

    def forward(self, x):
        return self.proj(x)


class TorchViT(nn.Module):
    """Backbone per vendored vit.py:200-341 (eval mode: no drop-path)."""

    def __init__(self, embed_dim, depth, num_heads, n_tokens):
        super().__init__()
        self.patch_embed = TorchPatchEmbed(embed_dim)
        self.pos_embed = nn.Parameter(torch.zeros(1, n_tokens + 1, embed_dim))
        self.blocks = nn.ModuleList(
            [TorchBlock(embed_dim, num_heads) for _ in range(depth)]
        )
        self.last_norm = nn.LayerNorm(embed_dim, eps=1e-6)

    def forward(self, x):
        x = self.patch_embed(x)           # (B, C, Hp, Wp)
        b, c, hp, wp = x.shape
        x = x.flatten(2).transpose(1, 2)  # (B, N, C)
        x = x + self.pos_embed[:, 1:] + self.pos_embed[:, :1]
        for blk in self.blocks:
            x = blk(x)
        return self.last_norm(x)          # (B, N, C)


class TorchRegressor(nn.Module):
    """whmr.py:42-130 minus the SMPL forward."""

    def __init__(self, feat_dim):
        super().__init__()
        npose = 216
        self.fc1 = nn.Linear(feat_dim + npose + 13 + 5, 1024)
        self.fc2 = nn.Linear(1024, 1024)
        self.decpose = nn.Linear(1024, npose)
        self.decshape = nn.Linear(1024, 10)
        self.deccam = nn.Linear(1024, 3)

    def forward(self, feat, bbox_info, init_pose, init_shape, init_cam):
        x = torch.cat((feat, bbox_info), dim=1)
        pred_pose, pred_shape, pred_cam = init_pose, init_shape, init_cam
        xc = torch.cat([x, pred_pose, pred_shape, pred_cam], 1)
        xc = self.fc1(xc)   # NO activation — faithful to the reference
        xc = self.fc2(xc)
        pred_pose = self.decpose(xc) + pred_pose
        pred_shape = self.decshape(xc) + pred_shape
        pred_cam = self.deccam(xc) + pred_cam
        return pred_pose, pred_shape, pred_cam


def torch_unbiased_gram_schmidt(x):
    """Reference geometry.py:260-273 formula (column-space GS)."""
    import torch.nn.functional as F

    k = x.shape[1]
    x = x.reshape(-1, 3, 3)
    t1, t2, t3 = x[:, :, 0], x[:, :, 1], x[:, :, 2]
    r1 = F.normalize((torch.cross(t2, t3, dim=-1) + t1) / 2.0)
    r2_ = (torch.cross(t3, r1, dim=-1) + t2) / 2.0
    r2 = F.normalize(r2_ - (torch.einsum("bi,bi->b", r2_, r1).unsqueeze(-1) * r1))
    r3 = torch.cross(r1, r2, dim=-1)
    return torch.stack((r1, r2, r3), dim=-1).reshape(-1, k, 3, 3)


class TorchTzHead(nn.Module):
    """whmr.py:417-430 (vitpose variant), eval mode."""

    def __init__(self, in_ch, tok, hidden=12):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(in_ch, 64, 7, stride=3, padding=0, bias=False),
            nn.Conv2d(64, 5, 7, stride=2, padding=0, bias=False),
        )
        # bare timm Block: default nn.LayerNorm -> eps 1e-5 (unlike the ViT)
        self.transformer_decoder = TorchBlock(tok, num_heads=2, qkv_bias=False, eps=1e-5)
        self.est_Tz = nn.Sequential(
            nn.Linear(tok, hidden), nn.Linear(hidden, 1), nn.BatchNorm1d(1),
            nn.Sigmoid(),
        )

    def forward(self, feat):  # feat (B, C, H, W)
        x = self.conv(feat)
        b = x.shape[0]
        x = x.reshape(b, 5, -1)  # (B, 5, tok): channel tokens (whmr.py:571)
        x = self.transformer_decoder(x)
        x = x.mean(dim=1)        # AvgPool1d(kernel=5) over the 5 tokens
        return 10.0 * self.est_Tz(x)[:, 0]


def _prefix_sd(module, prefix):
    return {prefix + k: v for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# the parity tests
# ---------------------------------------------------------------------------
class TestViTCompose:
    def test_two_block_vit_matches_torch(self):
        import jax
        import jax.numpy as jnp

        from whmr_tpu.config import ViTConfig
        from whmr_tpu.models.vit import ViTBackbone
        from whmr_tpu.utils.convert import convert_whmr_checkpoint

        e, depth, heads = 64, 2, 2
        img = (64, 48)
        cfg = ViTConfig(
            img_size=img, embed_dim=e, depth=depth, num_heads=heads,
            drop_path_rate=0.0,
        )
        hp, wp = cfg.grid_hw
        tmodel = TorchViT(e, depth, heads, hp * wp).eval()
        with torch.no_grad():
            for p in tmodel.parameters():
                p.copy_(torch.randn_like(p) * 0.05)

        converted = convert_whmr_checkpoint(
            _prefix_sd(tmodel, "feature_extractor.backbone.")
        )
        params = converted["params"]["feature_extractor"]

        x = np.random.RandomState(0).randn(2, *img, 3).astype(np.float32)
        with torch.no_grad():
            ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
        model = ViTBackbone(cfg)
        out = jax.jit(lambda p, x: model.apply({"params": p}, x, train=False))(
            params, jnp.asarray(x)
        )
        out_tokens = np.asarray(out).reshape(2, hp * wp, e)
        np.testing.assert_allclose(out_tokens, ref, atol=1e-4, rtol=1e-4)


class TestRegressorCompose:
    def test_full_regressor_step_matches_torch(self):
        import jax
        import jax.numpy as jnp

        from whmr_tpu.data.assets import synthetic_smpl_assets
        from whmr_tpu.models.regressor import (
            CamState,
            Regressor,
            body_consts_from_assets,
        )
        from whmr_tpu.utils.convert import convert_whmr_checkpoint

        feat_dim = 64
        rng = np.random.RandomState(1)
        tmodel = TorchRegressor(feat_dim).eval()
        with torch.no_grad():
            for p in tmodel.parameters():
                p.copy_(torch.randn_like(p) * 0.05)

        b = 3
        feat = rng.randn(b, feat_dim).astype(np.float32)
        bbox_info = rng.randn(b, 5).astype(np.float32) * 0.1
        init_pose = np.tile(np.eye(3).reshape(1, 9), (b, 24)).astype(np.float32)
        init_pose += rng.randn(b, 216).astype(np.float32) * 0.1
        init_shape = rng.randn(b, 10).astype(np.float32) * 0.3
        init_cam = np.array([[0.9, 0.05, -0.02]] * b, np.float32)

        with torch.no_grad():
            t_pose, t_shape, t_cam = tmodel(
                *(torch.from_numpy(a) for a in
                  (feat, bbox_info, init_pose, init_shape, init_cam))
            )
            t_rotmat = torch_unbiased_gram_schmidt(t_pose.view(b, 24, 3, 3))

        converted = convert_whmr_checkpoint(_prefix_sd(tmodel, "regressor.0."))
        params = converted["params"]["regressor0"]

        consts = body_consts_from_assets(synthetic_smpl_assets())
        model = Regressor()
        cam_state = CamState(
            bbox_info=jnp.asarray(bbox_info),
            center=jnp.zeros((b, 2)) + 300.0,
            scale=jnp.ones(b),
            bbox_height=jnp.zeros(b) + 200.0,
            orig_shape=jnp.tile(jnp.asarray([[720.0, 1280.0]]), (b, 1)),
            tz=jnp.ones(b) * 5.0,
        )

        def fwd(p, c):
            out, _ = model.apply(
                {"params": p}, c, jnp.asarray(feat), cam_state,
                jnp.asarray(init_pose), jnp.asarray(init_shape),
                jnp.asarray(init_cam), train=False, n_iter=1,
            )
            return out["pred_pose"], out["pred_shape"], out["pred_cam"], out["rotmat"]

        j_pose, j_shape, j_cam, j_rotmat = jax.jit(fwd)(params, consts)
        np.testing.assert_allclose(np.asarray(j_pose), t_pose.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(j_shape), t_shape.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(j_cam), t_cam.numpy(), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(j_rotmat), t_rotmat.numpy(), atol=1e-4
        )


class TestTzHeadCompose:
    def test_tz_head_matches_torch(self):
        import jax
        import jax.numpy as jnp

        from whmr_tpu.models.heads import TzHead
        from whmr_tpu.utils.convert import convert_whmr_checkpoint

        in_ch, h, w = 32, 128, 96
        h1, w1 = (h - 7) // 3 + 1, (w - 7) // 3 + 1
        tok = ((h1 - 7) // 2 + 1) * ((w1 - 7) // 2 + 1)
        tmodel = TorchTzHead(in_ch, tok).eval()
        with torch.no_grad():
            for p in tmodel.parameters():
                p.copy_(torch.randn_like(p) * 0.05)
            # non-trivial BN running stats
            tmodel.est_Tz[2].running_mean.fill_(0.3)
            tmodel.est_Tz[2].running_var.fill_(1.7)

        feat = np.random.RandomState(2).randn(3, h, w, in_ch).astype(np.float32)
        with torch.no_grad():
            ref = tmodel(torch.from_numpy(feat).permute(0, 3, 1, 2)).numpy()

        converted = convert_whmr_checkpoint(_prefix_sd(tmodel, ""))
        params = converted["params"]["tz_head"]
        stats = converted["batch_stats"]["tz_head"]
        model = TzHead(first_stride=3, hidden=12)
        out = jax.jit(
            lambda v, x: model.apply(v, x, train=False)
        )({"params": params, "batch_stats": stats}, jnp.asarray(feat))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)
