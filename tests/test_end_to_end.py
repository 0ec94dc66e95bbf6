"""End-to-end behaviors: learning actually happens; sharded inference;
bf16 numerics stay close to fp32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whmr_tpu.data.assets import synthetic_smpl_assets
from whmr_tpu.models.regressor import body_consts_from_assets
from whmr_tpu.models.whmr import WHMR
from whmr_tpu.parallel import batch_sharding, make_mesh
from whmr_tpu.training.train_step import create_train_state, make_jitted_train_step
from whmr_tpu.utils.testing import (
    make_example_inputs,
    make_example_train_batch,
    tiny_config,
)


class TestLearning:
    @pytest.mark.slow
    def test_loss_halves_on_fixed_dataset(self):
        """50 steps on one fixed batch must cut the loss by >35% — evidence
        the full gradient path (backbone -> MAF -> SMPL -> losses) learns.
        Calibration: random-GT losses have an irreducible floor (~55% of the
        initial value here); lr 2e-4 reaches it, 1e-3 diverges, the
        reference's 5e-5 gets ~25% in 50 steps."""
        cfg = tiny_config().with_overrides(**{"train.base_lr": 2e-4})
        consts = body_consts_from_assets(synthetic_smpl_assets())
        model = WHMR(cfg)
        args = {
            k: jnp.asarray(v) for k, v in make_example_inputs(cfg, 4).items()
        }
        state = create_train_state(cfg, model, consts, jax.random.PRNGKey(0), args)
        batch = {
            k: jnp.asarray(v) for k, v in make_example_train_batch(cfg, 4, seed=0).items()
        }
        step = make_jitted_train_step(cfg, model, donate=False)
        first = None
        for i in range(50):
            state, metrics = step(state, consts, batch, jax.random.PRNGKey(i))
            if first is None:
                first = float(metrics["loss"])
        last = float(metrics["loss"])
        assert last < first * 0.65, (first, last)


class TestShardedInference:
    def test_batch_sharded_forward_matches_single(self):
        """Inference over the data mesh must equal the unsharded forward."""
        cfg = tiny_config()
        consts = body_consts_from_assets(synthetic_smpl_assets())
        model = WHMR(cfg)
        inputs = make_example_inputs(cfg, 8)
        args = {k: jnp.asarray(v) for k, v in inputs.items()}
        state = create_train_state(cfg, model, consts, jax.random.PRNGKey(0), args)
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        fwd = jax.jit(
            lambda v, c, a: model.apply(v, c, **a)["smpl_out"][-1]["verts"]
        )
        ref = np.asarray(fwd(variables, consts, args))

        mesh = make_mesh()
        args_sh = jax.device_put(args, batch_sharding(mesh))
        out = np.asarray(fwd(variables, consts, args_sh))
        np.testing.assert_allclose(out, ref, atol=2e-4)


class TestBf16Numerics:
    def test_bf16_forward_close_to_fp32(self):
        """The bench/demo bf16 configuration must track fp32 at the cm level
        on an untrained model (trained models are smoother)."""
        cfg = tiny_config()
        consts = body_consts_from_assets(synthetic_smpl_assets())
        args = {k: jnp.asarray(v) for k, v in make_example_inputs(cfg, 2).items()}

        model32 = WHMR(cfg, dtype=jnp.float32)
        state = create_train_state(cfg, model32, consts, jax.random.PRNGKey(0), args)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        v32 = np.asarray(
            model32.apply(variables, consts, **args)["smpl_out"][-1]["verts"]
        )
        model16 = WHMR(cfg, dtype=jnp.bfloat16)
        v16 = np.asarray(
            model16.apply(variables, consts, **args)["smpl_out"][-1]["verts"]
        )
        # mean vertex deviation in meters
        dev = np.sqrt(((v32 - v16) ** 2).sum(-1)).mean()
        assert dev < 0.02, dev
