"""Fused Pallas attention: parity vs the einsum reference (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from whmr_tpu.ops.attention_pallas import fused_attention


def reference_attention(q, k, v):
    d = q.shape[-1]
    s = np.einsum("bhnd,bhmd->bhnm", q.astype(np.float32), k.astype(np.float32)) / np.sqrt(d)
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhnm,bhmd->bhnd", p, v.astype(np.float32))


class TestFusedAttention:
    def test_matches_reference(self, rng):
        q = rng.randn(2, 4, 192, 64).astype(np.float32)
        k = rng.randn(2, 4, 192, 64).astype(np.float32)
        v = rng.randn(2, 4, 192, 64).astype(np.float32)
        out = np.asarray(
            fused_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True)
        )
        ref = reference_attention(q, k, v)
        np.testing.assert_allclose(out, ref, atol=2e-4)

    def test_bf16_path(self, rng):
        q = jnp.asarray(rng.randn(1, 2, 192, 64).astype(np.float32)).astype(jnp.bfloat16)
        out = fused_attention(q, q, q, interpret=True)
        assert out.dtype == jnp.bfloat16
        assert np.all(np.isfinite(np.asarray(out, dtype=np.float32)))
