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
        (_, _, _, n), _ = step(variables, consts, batch)
        assert float(n) == 2.0

    def test_j17_protocol_and_result_file(self, tmp_path):
        """mpi-inf-3dhp J17 mapper + --result_file array dump
        (reference eval.py:150-151, 312-319)."""
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
        out = str(tmp_path / "res.npz")
        result = run_evaluation(
            cfg, model, variables, consts, [make_eval_batch(cfg, 4)],
            log_every=0, joint_mapper="j17", result_file=out,
        )
        assert result["count"] == 4
        dump = np.load(out)
        assert dump["pred"].shape == (4, 17, 3)
        assert dump["pred_pa"].shape == (4, 17, 3)
        assert dump["gt"].shape == (4, 17, 3)
        assert dump["pred_joints"].shape == (4, 17, 3)
        assert dump["pose"].shape == (4, 72)
        assert dump["betas"].shape == (4, 10)
        assert dump["camera"].shape == (4, 3)

    def test_data_parallel_eval_matches_single_device(self, tmp_path):
        """Sharded (mesh) eval reproduces single-device metrics exactly,
        including a ragged last batch that gets zero-padded, and trims the
        padded rows from the --result_file dump. Net-new vs the reference's
        rank-0-only validation (train.py:44-47)."""
        from whmr_tpu.parallel import make_mesh

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
        full = make_eval_batch(cfg, 8, seed=0)
        ragged = make_eval_batch(cfg, 5, seed=1)  # pads 5 -> 8 on the mesh
        out_ref = str(tmp_path / "single.npz")
        out_dp = str(tmp_path / "sharded.npz")
        r_single = run_evaluation(
            cfg, model, variables, consts, [full, ragged], log_every=0,
            result_file=out_ref,
        )
        r_dp = run_evaluation(
            cfg, model, variables, consts, [full, ragged], log_every=0,
            result_file=out_dp, mesh=make_mesh(),
        )
        assert r_dp["count"] == r_single["count"] == 13
        for k in ("mpjpe", "pa_mpjpe", "pve"):
            np.testing.assert_allclose(r_dp[k], r_single[k], rtol=2e-5)
        a, b = np.load(out_ref), np.load(out_dp)
        for k in a.files:
            assert a[k].shape == b[k].shape, k  # padded rows trimmed
            np.testing.assert_allclose(a[k], b[k], rtol=2e-4, atol=2e-5)

    def test_gendered_smpl_changes_gt(self):
        """Gendered GT vertices flow through the metric (3DPW protocol,
        trainer.py:784-798)."""
        cfg = tiny_config()
        assets = synthetic_smpl_assets()
        consts = body_consts_from_assets(assets)
        from whmr_tpu.models.smpl import smpl_params_from_assets

        # fake 'gendered' models: scaled templates so metrics must differ
        male = smpl_params_from_assets(synthetic_smpl_assets(seed=1))
        female = smpl_params_from_assets(synthetic_smpl_assets(seed=2))
        model = WHMR(cfg)
        inputs = make_example_inputs(cfg, 4)
        args = dict(
            x=jnp.asarray(inputs["x"]), center=jnp.asarray(inputs["center"]),
            scale=jnp.asarray(inputs["scale"]), bbox_height=jnp.asarray(inputs["bbox_height"]),
            orig_shape=jnp.asarray(inputs["orig_shape"]), bbox_info=jnp.asarray(inputs["bbox_info"]),
        )
        state = create_train_state(cfg, model, consts, jax.random.PRNGKey(0), args)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        batch = make_eval_batch(cfg, 4)
        batch["gender"] = jnp.asarray([0, 1, -1, 0], jnp.int32)
        r_neutral = run_evaluation(
            cfg, model, variables, consts, [batch], log_every=0
        )
        r_gendered = run_evaluation(
            cfg, model, variables, consts, [batch], log_every=0,
            gendered_smpl={"male": male, "female": female},
        )
        assert r_neutral["mpjpe"] != r_gendered["mpjpe"]
