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


class TestGradClip:
    """train.grad_clip_norm wires optax.clip_by_global_norm ahead of Adam.

    Net-new opt-in knob (0 = off keeps the reference's unclipped protocol):
    observed need in the round-5 HMR overfit run — lr 2e-4 diverged
    (loss 36 -> 97) off ~2e4-norm from-scratch gradients.
    """

    def test_aggressive_clip_shrinks_first_update(self):
        from whmr_tpu.training.train_step import make_optimizer
        from whmr_tpu.utils.testing import tiny_config

        params = {"w": jnp.zeros(3, jnp.float32)}
        grads = {"w": jnp.asarray([30.0, 40.0, 0.0])}  # global norm 50
        lr = float(tiny_config().train.base_lr)

        # Unclipped Adam's first update is ~ -lr * sign(g) (m/sqrt(v) = 1).
        tx0 = make_optimizer(tiny_config())
        upd0, _ = tx0.update(grads, tx0.init(params), params)
        assert abs(float(upd0["w"][0])) > 0.9 * lr

        # A tiny clip norm pushes sqrt(v_hat) below Adam's eps, so the
        # first update collapses ~eps-fold — impossible without the clip
        # (Adam alone is scale-invariant in its first step).
        cfg = tiny_config().with_overrides(**{"train.grad_clip_norm": 1e-9})
        tx = make_optimizer(cfg)
        upd, _ = tx.update(grads, tx.init(params), params)
        assert abs(float(upd["w"][0])) < 0.1 * lr

    def test_clip_composes_with_fused_adam(self):
        from whmr_tpu.training.train_step import make_optimizer
        from whmr_tpu.utils.testing import tiny_config

        params = {"w": jnp.zeros(4, jnp.float32)}
        grads = {"w": jnp.full((4,), 100.0)}
        cfg = tiny_config().with_overrides(
            **{"train.grad_clip_norm": 1.0, "train.fused_adam": True}
        )
        ref = tiny_config().with_overrides(**{"train.grad_clip_norm": 1.0})
        tx, tx_ref = make_optimizer(cfg), make_optimizer(ref)
        upd, _ = tx.update(grads, tx.init(params), params)
        upd_ref, _ = tx_ref.update(grads, tx_ref.init(params), params)
        np.testing.assert_allclose(
            np.asarray(upd["w"]), np.asarray(upd_ref["w"]), atol=1e-6
        )
