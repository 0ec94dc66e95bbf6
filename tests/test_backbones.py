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
