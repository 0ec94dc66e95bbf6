"""Fused Pallas attention: parity vs the einsum reference (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from whmr_tpu.ops.attention_pallas import fused_attention, fused_attention_heads


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

    def test_head_batched_matches_reference(self, rng):
        q = rng.randn(2, 4, 64, 32).astype(np.float32)
        k = rng.randn(2, 4, 64, 32).astype(np.float32)
        v = rng.randn(2, 4, 64, 32).astype(np.float32)
        out = np.asarray(fused_attention_heads(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True
        ))
        np.testing.assert_allclose(out, reference_attention(q, k, v), atol=2e-4)


class TestAttentionImpls:
    """All models/layers.Attention impl variants agree on the same params
    (fp32: bitwise-equivalent math; 'bf16sm' only diverges in bf16 mode)."""

    def test_impl_parity_fp32(self, rng):
        import jax
        from whmr_tpu.models.layers import Attention

        x = jnp.asarray(rng.randn(2, 24, 64).astype(np.float32))
        base = Attention(num_heads=4, impl="einsum")
        vs = base.init(jax.random.PRNGKey(0), x)
        ref = np.asarray(base.apply(vs, x))
        for impl in ("bhnd", "xla_dpa", "pallas", "split", "bf16sm", "bhnd_bf16sm"):
            out = np.asarray(Attention(num_heads=4, impl=impl).apply(vs, x))
            np.testing.assert_allclose(out, ref, atol=2e-5, err_msg=impl)

    def test_unknown_impl_raises(self, rng):
        import jax
        import pytest
        from whmr_tpu.models.layers import Attention

        x = jnp.asarray(rng.randn(1, 8, 32).astype(np.float32))
        m = Attention(num_heads=4, impl="nope")
        with pytest.raises(ValueError, match="unknown attention impl"):
            m.init(jax.random.PRNGKey(0), x)
