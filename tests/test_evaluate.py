"""Evaluation pipeline machinery tests."""

import jax
import jax.numpy as jnp
import numpy as np

from whmr_tpu.data.assets import synthetic_smpl_assets
from whmr_tpu.inference.evaluate import make_eval_step, run_evaluation
from whmr_tpu.models.regressor import body_consts_from_assets
from whmr_tpu.models.whmr import WHMR
from whmr_tpu.training.train_step import create_train_state
from whmr_tpu.utils.testing import make_example_inputs, make_example_train_batch, tiny_config


def make_eval_batch(cfg, batch=4, seed=0):
    b = make_example_train_batch(cfg, batch, seed=seed)
    rng = np.random.RandomState(seed + 7)
    return {
        "img": jnp.asarray(b["img"]),
        "center": jnp.asarray(b["center"]),
        "scale": jnp.asarray(b["scale"]),
        "bbox_height": jnp.asarray(b["bbox_height"]),
        "orig_shape": jnp.asarray(b["orig_shape"]),
        "bbox_info": jnp.asarray(b["bbox_info"]),
        "pose": jnp.asarray(b["pose"]),
        "betas": jnp.asarray(b["betas"]),
        "cam_rotmat": jnp.broadcast_to(jnp.eye(3), (batch, 3, 3)),
        "valid": jnp.ones((batch,)),
    }


class TestEvaluation:
    def test_metrics_finite_and_positive(self):
        cfg = tiny_config()
        consts = body_consts_from_assets(synthetic_smpl_assets())
        model = WHMR(cfg)
        inputs = make_example_inputs(cfg, 4)
        args = dict(
            x=jnp.asarray(inputs["x"]), center=jnp.asarray(inputs["center"]),
            scale=jnp.asarray(inputs["scale"]), bbox_height=jnp.asarray(inputs["bbox_height"]),
            orig_shape=jnp.asarray(inputs["orig_shape"]), bbox_info=jnp.asarray(inputs["bbox_info"]),
        )
        state = create_train_state(cfg, model, consts, jax.random.PRNGKey(0), args)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        batches = [make_eval_batch(cfg, 4, seed=s) for s in range(2)]
        result = run_evaluation(cfg, model, variables, consts, batches, log_every=0)
        assert result["count"] == 8
        for k in ("mpjpe", "pa_mpjpe", "pve"):
            assert np.isfinite(result[k]) and result[k] > 0
        # PA-MPJPE <= MPJPE by construction of the alignment
        assert result["pa_mpjpe"] <= result["mpjpe"] + 1e-6

    def test_valid_mask_excludes_samples(self):
        cfg = tiny_config()
        consts = body_consts_from_assets(synthetic_smpl_assets())
        model = WHMR(cfg)
        inputs = make_example_inputs(cfg, 4)
        args = dict(
            x=jnp.asarray(inputs["x"]), center=jnp.asarray(inputs["center"]),
            scale=jnp.asarray(inputs["scale"]), bbox_height=jnp.asarray(inputs["bbox_height"]),
            orig_shape=jnp.asarray(inputs["orig_shape"]), bbox_info=jnp.asarray(inputs["bbox_info"]),
        )
        state = create_train_state(cfg, model, consts, jax.random.PRNGKey(0), args)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        step = make_eval_step(cfg, model)
        batch = make_eval_batch(cfg, 4)
        batch["valid"] = jnp.asarray([1.0, 1.0, 0.0, 0.0])
        _, _, _, n = step(variables, consts, batch)
        assert float(n) == 2.0
