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
        # train=True now exercises the BERT dropouts -> needs the rng; the
        # SAME key for both calls keeps the dropout masks identical so the
        # only difference is the meta mask.
        rngs = {"dropout": jax.random.PRNGKey(7)}
        a = net.apply(params, body_feat, grid_feat, temp_verts, adj,
                      meta_masks=full_mask, train=True, rngs=rngs)
        b = net.apply(params, body_feat, grid_feat, temp_verts, adj,
                      meta_masks=zero_mask, train=True, rngs=rngs)
        assert np.abs(np.asarray(a["verts"]) - np.asarray(b["verts"])).max() > 1e-5


class TestGraphormerIntegration:
    """grph_on wires the refiner into the WHMR graph (VERDICT item 4:
    reference slot whmr.py:613-626 / e2e_body_network.py:44-150)."""

    def _setup(self, train_batch=False):
        from dataclasses import replace

        import jax
        import jax.numpy as jnp

        from whmr_tpu.data.assets import synthetic_smpl_assets
        from whmr_tpu.models.regressor import body_consts_from_assets
        from whmr_tpu.models.whmr import WHMR
        from whmr_tpu.training.train_step import create_train_state
        from whmr_tpu.utils.testing import make_example_inputs, tiny_config

        cfg = tiny_config()
        cfg = replace(cfg, pymaf=replace(cfg.pymaf, grph_on=True))
        consts = body_consts_from_assets(synthetic_smpl_assets())
        model = WHMR(cfg)
        inputs = make_example_inputs(cfg, 4)
        args = {k: jnp.asarray(v) for k, v in inputs.items()}
        state = create_train_state(cfg, model, consts, jax.random.PRNGKey(0), args)
        return cfg, model, state, consts, args

    def test_forward_appends_refined_stage(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        cfg, model, state, consts, args = self._setup()
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        out = jax.jit(
            lambda v, c, a: model.apply(v, c, train=False, **a)
        )(variables, consts, args)
        # init + 3 MAF steps + refined stage
        assert len(out["smpl_out"]) == 5
        refined = out["refined"]
        assert refined["temp_verts"].shape == (4, 431, 3)
        assert refined["sub_verts"].shape == (4, 1723, 3)
        assert refined["verts"].shape == (4, 6890, 3)
        # the refiner actually changed the mesh vs the parametric step
        parametric = out["smpl_out"][3]
        assert float(jnp.abs(refined["verts"] - parametric["verts"]).max()) > 0
        assert np.isfinite(np.asarray(refined["verts"])).all()
        assert refined["kp_2d"].shape == (4, 49, 2)
        assert refined["kp_2d_w"].shape == (4, 49, 2)

    def test_train_step_grads_reach_graphormer(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from whmr_tpu.training.train_step import make_jitted_train_step
        from whmr_tpu.utils.testing import make_example_train_batch

        cfg, model, state, consts, _ = self._setup()
        batch = {
            k: jnp.asarray(v) for k, v in make_example_train_batch(cfg, 4).items()
        }
        step_fn = make_jitted_train_step(cfg, model, donate=False)
        new_state, metrics = step_fn(state, consts, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        # vertex losses exist for the appended stage (l_i=4 > 2)
        assert "loss_shape_4" in metrics
        # ...but NOT parametric losses: the refiner stage carries stage 3's
        # rotmat/shape/cam unchanged; scoring them again would double the
        # last parametric step's gradient.
        assert "loss_regr_pose_4" not in metrics
        assert "loss_regr_betas_4" not in metrics
        assert "loss_cam_4" not in metrics
        assert "loss_regr_pose_3" in metrics
        moved = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.params["transformer0"], new_state.params["transformer0"],
        )
        assert max(jax.tree.leaves(moved)) > 0
