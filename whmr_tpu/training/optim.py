"""Fused flat-buffer Adam: one (N,) moment update instead of 404 per-leaf ops.

MEASURED NEGATIVE RESULT on v5e — kept as a documented experiment, default
OFF. Hypothesis: the WHMR tree has ~404 leaves (137.6M params) and the
per-leaf optax.adam update measures ~10.5 ms against a ~4.7 ms bandwidth
floor (scripts/bench_backward.py adam), so flattening the moment math into
a few big fusions should win. Measurement (scripts/bench_train.py
step_fused, B=64 aux-on): **154.1 ms vs 136.1 ms baseline** — the flat
formulation LOSES ~18 ms. The materialized (N,) gradient concat + update
slices add ~2 GB of HBM traffic, every per-leaf gradient stays live until
the concat (no incremental buffer reuse), and the big temporaries defeat
XLA's donation/aliasing of the moment buffers. XLA's per-leaf fusions are
already the right lowering on this stack.

Numerics match `optax.adam` exactly (same update_moment / bias_correction /
`mu_hat / (sqrt(nu_hat) + eps)` formulas, same schedule step indexing) —
asserted by tests/test_optim.py against optax on random trees and schedules.

Scope: the flat moment buffers intentionally do NOT mirror the param tree,
so `parallel.shard_opt_state` replicates them — correct for single-chip and
pure data-parallel training (where optax moments are replicated anyway), but
wrong for FSDP/TP moment sharding. `make_optimizer` therefore only selects
this when `cfg.train.fused_adam` is set, and the Trainer refuses the
combination with `--fsdp`/`model_parallel>1`.

Reference counterpart: torch.optim.Adam with foreach/fused=True
(the reference trains with plain Adam, core/trainer.py:328).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax


class FusedAdamState(NamedTuple):
    count: jnp.ndarray  # ()
    mu: jnp.ndarray     # (N,) fp32
    nu: jnp.ndarray     # (N,) fp32


def fused_adam(
    learning_rate: Union[float, Callable],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Drop-in for `optax.adam(learning_rate)` with flat fused moments."""

    def init(params):
        n = sum(
            int(jnp.size(leaf)) for leaf in jax.tree_util.tree_leaves(params)
        )
        return FusedAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jnp.zeros((n,), jnp.float32),
            nu=jnp.zeros((n,), jnp.float32),
        )

    def update(grads, state, params=None):
        del params
        leaves, treedef = jax.tree_util.tree_flatten(grads)
        flat_g = jnp.concatenate(
            [leaf.astype(jnp.float32).reshape(-1) for leaf in leaves]
        )
        count = state.count + 1
        mu = state.mu * b1 + flat_g * (1.0 - b1)
        nu = state.nu * b2 + jnp.square(flat_g) * (1.0 - b2)
        cf = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - jnp.power(jnp.float32(b1), cf))
        nu_hat = nu / (1.0 - jnp.power(jnp.float32(b2), cf))
        # optax.adam applies the schedule at the PRE-increment count (its
        # scale_by_learning_rate keeps a separate counter that starts at 0).
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        flat_u = (-lr) * mu_hat / (jnp.sqrt(nu_hat) + eps)

        updates = []
        offset = 0
        for leaf in leaves:
            size = int(jnp.size(leaf))
            updates.append(
                flat_u[offset:offset + size].reshape(leaf.shape).astype(leaf.dtype)
            )
            offset += size
        return (
            jax.tree_util.tree_unflatten(treedef, updates),
            FusedAdamState(count=count, mu=mu, nu=nu),
        )

    return optax.GradientTransformation(init, update)
