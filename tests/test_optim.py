"""fused_adam (training/optim.py) must match optax.adam step-for-step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from whmr_tpu.training.optim import fused_adam


def _random_tree(rng):
    return {
        "dense": {
            "kernel": jnp.asarray(rng.randn(17, 9).astype(np.float32)),
            "bias": jnp.asarray(rng.randn(9).astype(np.float32)),
        },
        "scale": jnp.asarray(rng.randn(1).astype(np.float32)),
        "conv": jnp.asarray(rng.randn(3, 3, 4, 8).astype(np.float32)),
    }


def _run_steps(tx, params, grads_seq):
    state = tx.init(params)
    out = []
    for g in grads_seq:
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
        out.append(params)
    return out


@pytest.mark.smoke
class TestFusedAdam:
    @pytest.mark.parametrize("use_schedule", [False, True])
    def test_matches_optax_adam(self, rng, use_schedule):
        params = _random_tree(rng)
        grads_seq = [
            jax.tree_util.tree_map(
                lambda p: jnp.asarray(
                    rng.randn(*p.shape).astype(np.float32) * 0.1
                ),
                params,
            )
            for _ in range(5)
        ]
        if use_schedule:
            # Decay INSIDE the tested window so the pre-increment schedule
            # indexing is exercised, not just a constant lr.
            lr = optax.piecewise_constant_schedule(1e-3, {2: 0.1, 4: 0.5})
        else:
            lr = 1e-3
        ref = _run_steps(optax.adam(lr), params, grads_seq)
        got = _run_steps(fused_adam(lr), params, grads_seq)
        for step, (r, g) in enumerate(zip(ref, got)):
            for (kr, vr), (kg, vg) in zip(
                jax.tree_util.tree_leaves_with_path(r),
                jax.tree_util.tree_leaves_with_path(g),
            ):
                assert str(kr) == str(kg)
                np.testing.assert_allclose(
                    np.asarray(vr), np.asarray(vg), rtol=0, atol=1e-7,
                    err_msg=f"step {step} leaf {kr}",
                )

    def test_bf16_param_leaves_round_trip(self, rng):
        """Mixed-dtype trees: updates come back in each leaf's dtype."""
        params = {
            "a": jnp.asarray(rng.randn(4, 4).astype(np.float32)),
            "b": jnp.asarray(rng.randn(8).astype(np.float32)).astype(jnp.bfloat16),
        }
        tx = fused_adam(1e-3)
        state = tx.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        assert updates["a"].dtype == jnp.float32
        assert updates["b"].dtype == jnp.bfloat16
        assert updates["a"].shape == (4, 4)

    def test_moment_buffer_is_flat_total_size(self, rng):
        params = _random_tree(rng)
        n = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
        state = fused_adam(1e-3).init(params)
        assert state.mu.shape == (n,)
        assert state.nu.shape == (n,)
