"""Tests for batched Procrustes alignment and pose metrics."""

import pytest
import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyRot

from whmr_tpu.ops import procrustes as P

pytestmark = pytest.mark.smoke


class TestSimilarityTransform:
    def test_recovers_similarity_transform(self, rng):
        """s1 = (R, s, t) applied to s2 -> alignment should recover s2 exactly."""
        b, j = 8, 14
        s2 = rng.randn(b, j, 3).astype(np.float32)
        rot = ScipyRot.random(b, random_state=rng).as_matrix().astype(np.float32)
        scale = rng.uniform(0.5, 2.0, size=(b, 1, 1)).astype(np.float32)
        t = rng.randn(b, 1, 3).astype(np.float32)
        s1 = scale * np.einsum("bij,bkj->bki", rot, s2) + t
        aligned = np.asarray(P.batch_compute_similarity_transform(jnp.asarray(s1), jnp.asarray(s2)))
        np.testing.assert_allclose(aligned, s2, atol=1e-4)

    def test_reflection_not_allowed(self, rng):
        """Mirrored points must NOT align perfectly (det(R)=+1 enforced)."""
        b, j = 4, 14
        s2 = rng.randn(b, j, 3).astype(np.float32)
        s1 = s2.copy()
        s1[..., 0] *= -1.0
        err = float(P.pa_mpjpe(jnp.asarray(s1), jnp.asarray(s2)))
        assert err > 1e-3

    def test_matches_reference_numpy(self, rng):
        """Golden test vs an independent per-sample umeyama implementation."""
        def umeyama(src, dst):
            mu1, mu2 = src.mean(0), dst.mean(0)
            x1, x2 = src - mu1, dst - mu2
            var1 = (x1**2).sum()
            k = x1.T @ x2
            u, _, vh = np.linalg.svd(k)
            v = vh.T
            z = np.eye(3)
            z[-1, -1] = np.sign(np.linalg.det(u @ v.T))
            r = v @ z @ u.T
            scale = np.trace(r @ k) / var1
            t = mu2 - scale * (r @ mu1)
            return scale * src @ r.T + t

        b, j = 6, 17
        s1 = rng.randn(b, j, 3).astype(np.float64)
        s2 = rng.randn(b, j, 3).astype(np.float64)
        ref = np.stack([umeyama(s1[i], s2[i]) for i in range(b)])
        ours = np.asarray(
            P.batch_compute_similarity_transform(jnp.asarray(s1, dtype=jnp.float32), jnp.asarray(s2, dtype=jnp.float32))
        )
        np.testing.assert_allclose(ours, ref, atol=1e-3)


class TestMetrics:
    def test_mpjpe_known_offset(self, rng):
        gt = rng.randn(4, 14, 3).astype(np.float32)
        pred = gt + np.array([0.03, 0.0, 0.04], np.float32)  # 50mm offset
        err = float(P.mpjpe(jnp.asarray(pred), jnp.asarray(gt)))
        np.testing.assert_allclose(err, 0.05, rtol=1e-5)

    def test_pa_mpjpe_invariant_to_similarity(self, rng):
        gt = rng.randn(4, 14, 3).astype(np.float32)
        rot = ScipyRot.random(4, random_state=rng).as_matrix().astype(np.float32)
        pred = 1.7 * np.einsum("bij,bkj->bki", rot, gt) + 0.3
        err = float(P.pa_mpjpe(jnp.asarray(pred), jnp.asarray(gt)))
        assert err < 1e-4

    def test_pve(self, rng):
        gt = rng.randn(2, 100, 3).astype(np.float32)
        err = float(P.per_vertex_error(jnp.asarray(gt), jnp.asarray(gt)))
        assert err < 1e-7
