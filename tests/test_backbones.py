"""Backbone unit tests: shapes, BN behavior, ViT details."""

import jax
import jax.numpy as jnp
import numpy as np

from whmr_tpu.config import ViTConfig
from whmr_tpu.models.resnet import CamCalibNet, PoseResNetEncoder, ResNetBackbone
from whmr_tpu.models.vit import ViTBackbone


class TestViT:
    def test_vitpose_grid_shape(self, rng):
        cfg = ViTConfig(embed_dim=64, depth=2, num_heads=2, drop_path_rate=0.0)
        assert cfg.grid_hw == (16, 12)  # 256x192 pad4 k16 s16 (vit.py:158)
        model = ViTBackbone(cfg)
        x = jnp.asarray(rng.randn(2, 256, 192, 3).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (2, 16, 12, 64)
        # pos embed carries the cls slot: 16*12+1 rows (vit.py:311-320)
        assert params["params"]["pos_embed"].shape == (1, 193, 64)

    def test_drop_path_train_stochastic(self, rng):
        cfg = ViTConfig(embed_dim=64, depth=2, num_heads=2, drop_path_rate=0.5)
        model = ViTBackbone(cfg)
        x = jnp.asarray(rng.randn(2, 256, 192, 3).astype(np.float32))
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, train=True,
        )
        a = model.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
        b = model.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(3)})
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6
        # deterministic in eval
        c = model.apply(params, x)
        d = model.apply(params, x)
        np.testing.assert_array_equal(np.asarray(c), np.asarray(d))


class TestResNet:
    def test_backbone_output_shapes(self, rng):
        model = ResNetBackbone()
        x = jnp.asarray(rng.randn(1, 224, 224, 3).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        feat, pooled = model.apply(variables, x)
        assert feat.shape == (1, 7, 7, 2048)
        assert pooled.shape == (1, 2048)

    def test_pose_resnet_spatial(self, rng):
        model = PoseResNetEncoder()
        x = jnp.asarray(rng.randn(1, 256, 192, 3).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        feat = model.apply(variables, x)
        assert feat.shape == (1, 8, 6, 2048)

    def test_camcalib_heads(self, rng):
        model = CamCalibNet()
        x = jnp.asarray(rng.randn(1, 128, 128, 3).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        (vfov, pitch, roll), feat = model.apply(variables, x)
        assert vfov.shape == pitch.shape == roll.shape == (1, 256)
        assert feat.shape == (1, 2048)

    def test_batchnorm_updates_in_train(self, rng):
        model = ResNetBackbone()
        x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        _, updated = model.apply(variables, x, train=True, mutable=["batch_stats"])
        before = jax.tree.leaves(variables["batch_stats"])[0]
        after = jax.tree.leaves(updated["batch_stats"])[0]
        assert np.abs(np.asarray(before) - np.asarray(after)).max() > 0


class TestResNetTorchParity:
    def test_strided_bottleneck_matches_torch(self, rng):
        """Stride-2 stage-entry Bottleneck must reproduce torch's
        Conv2d(3, stride=2, padding=1) window placement. Regression: the
        3x3 ConvBN used padding="SAME", which XLA resolves to (0, 1) on
        even inputs — every feature one pixel shifted vs the reference,
        silently corrupting converted ResNet checkpoints (CamCalib, res50
        backbone, HMR baseline). BNs are left at init (mean 0 / var 1 /
        scale 1 / bias 0, eps 1e-5 in both frameworks) so the comparison
        isolates the convolutions."""
        import torch
        import torch.nn as tnn

        from whmr_tpu.models.layers import Bottleneck

        cin, planes = 16, 8
        blk = Bottleneck(planes, strides=(2, 2), downsample=True)
        x = np.random.RandomState(0).randn(1, 10, 10, cin).astype(np.float32)
        variables = blk.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
        out = np.asarray(blk.apply(variables, jnp.asarray(x), False))

        p = variables["params"]

        def w(name):
            k = np.asarray(p[name]["Conv_0"]["kernel"])  # HWIO -> OIHW
            return torch.from_numpy(k.transpose(3, 2, 0, 1).copy())

        conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        conv2 = tnn.Conv2d(planes, planes, 3, stride=2, padding=1, bias=False)
        conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        down = tnn.Conv2d(cin, planes * 4, 1, stride=2, bias=False)
        bn1, bn2 = tnn.BatchNorm2d(planes), tnn.BatchNorm2d(planes)
        bn3, bnd = tnn.BatchNorm2d(planes * 4), tnn.BatchNorm2d(planes * 4)
        with torch.no_grad():
            conv1.weight.copy_(w("ConvBN_0"))
            conv2.weight.copy_(w("ConvBN_1"))
            conv3.weight.copy_(w("ConvBN_2"))
            down.weight.copy_(w("ConvBN_3"))
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
        with torch.no_grad():
            for m in (bn1, bn2, bn3, bnd):
                m.eval()
            y = torch.relu(bn1(conv1(xt)))
            y = torch.relu(bn2(conv2(y)))
            y = bn3(conv3(y))
            ref = torch.relu(y + bnd(down(xt)))
        ref = ref.numpy().transpose(0, 2, 3, 1)
        assert out.shape == ref.shape == (1, 5, 5, planes * 4)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


class TestRemat:
    def test_remat_matches_non_remat(self, rng):
        from dataclasses import replace

        cfg = ViTConfig(embed_dim=64, depth=2, num_heads=2, drop_path_rate=0.0)
        x = jnp.asarray(rng.randn(2, 256, 192, 3).astype(np.float32))
        m1 = ViTBackbone(cfg)
        params = m1.init(jax.random.PRNGKey(0), x)
        m2 = ViTBackbone(replace(cfg, remat=True))
        out1 = m1.apply(params, x)
        out2 = m2.apply(params, x)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)
        # gradients flow through the remat path
        g = jax.grad(lambda p: jnp.sum(m2.apply(p, x) ** 2))(params)
        assert np.isfinite(np.asarray(jax.tree.leaves(g)[0])).all()
