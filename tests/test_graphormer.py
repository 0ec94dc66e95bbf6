"""Graphormer vertex refiner tests."""

import jax
import jax.numpy as jnp
import numpy as np

from whmr_tpu.data.assets import synthetic_smpl_assets
from whmr_tpu.models.graphormer import (
    GraphormerBodyNetwork,
    GraphormerEncoder,
    build_adjacency,
)


class TestAdjacency:
    def test_row_normalized(self):
        adj = build_adjacency(synthetic_smpl_assets())
        assert adj.shape == (431, 431)
        np.testing.assert_allclose(adj.sum(axis=1), 1.0, atol=1e-5)


class TestEncoder:
    def test_shapes_and_finite(self, rng):
        adj = jnp.asarray(build_adjacency(synthetic_smpl_assets()))
        tokens = jnp.asarray(rng.randn(2, 432, 259).astype(np.float32))
        enc = GraphormerEncoder()
        params = enc.init(jax.random.PRNGKey(0), tokens, adj)
        out = enc.apply(params, tokens, adj)
        assert out.shape == (2, 432, 3)
        assert np.all(np.isfinite(np.asarray(out)))


class TestBodyNetwork:
    def test_refinement_outputs(self, rng):
        assets = synthetic_smpl_assets()
        adj = jnp.asarray(build_adjacency(assets))
        net = GraphormerBodyNetwork()
        body_feat = jnp.asarray(rng.randn(2, 2155).astype(np.float32))
        grid_feat = jnp.asarray(rng.randn(2, 431, 256).astype(np.float32))
        temp_verts = jnp.asarray(rng.randn(2, 431, 3).astype(np.float32) * 0.3)
        params = net.init(
            jax.random.PRNGKey(0), body_feat, grid_feat, temp_verts, adj
        )
        out = net.apply(params, body_feat, grid_feat, temp_verts, adj)
        assert out["temp_verts"].shape == (2, 431, 3)
        assert out["sub_verts"].shape == (2, 1723, 3)
        assert out["verts"].shape == (2, 6890, 3)
        for v in out.values():
            assert np.all(np.isfinite(np.asarray(v)))

    def test_meta_mask_changes_output(self, rng):
        assets = synthetic_smpl_assets()
        adj = jnp.asarray(build_adjacency(assets))
        net = GraphormerBodyNetwork()
        body_feat = jnp.asarray(rng.randn(1, 2155).astype(np.float32))
        grid_feat = jnp.asarray(rng.randn(1, 431, 256).astype(np.float32))
        temp_verts = jnp.asarray(rng.randn(1, 431, 3).astype(np.float32))
        params = net.init(jax.random.PRNGKey(0), body_feat, grid_feat, temp_verts, adj)
        full_mask = jnp.ones((1, 431, 1))
        zero_mask = jnp.zeros((1, 431, 1))
        a = net.apply(params, body_feat, grid_feat, temp_verts, adj, meta_masks=full_mask, train=True)
        b = net.apply(params, body_feat, grid_feat, temp_verts, adj, meta_masks=zero_mask, train=True)
        assert np.abs(np.asarray(a["verts"]) - np.asarray(b["verts"])).max() > 1e-5
