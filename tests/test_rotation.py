"""Unit tests for whmr_tpu.ops.rotation.

Strategy per SURVEY.md §4: round-trip identities, orthonormality invariants,
and golden comparison against independent scipy implementations.
"""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyRot

from whmr_tpu.ops import rotation as R

pytestmark = pytest.mark.smoke


def random_rotmats(rng, n=32):
    return ScipyRot.random(n, random_state=rng).as_matrix().astype(np.float32)


def assert_rotation(mats, atol=1e-5):
    mats = np.asarray(mats)
    eye = np.eye(3, dtype=np.float32)
    for m in mats:
        np.testing.assert_allclose(m @ m.T, eye, atol=atol)
        assert np.linalg.det(m) > 0.99


class TestRodrigues:
    def test_matches_scipy(self, rng):
        aa = rng.uniform(-1.5, 1.5, size=(64, 3)).astype(np.float32)
        ours = np.asarray(R.batch_rodrigues(jnp.asarray(aa)))
        ref = ScipyRot.from_rotvec(aa).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_zero_angle(self):
        out = np.asarray(R.batch_rodrigues(jnp.zeros((4, 3))))
        np.testing.assert_allclose(out, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-5)


class TestRot6d:
    def test_valid_rotation(self, rng):
        x = rng.randn(32, 6).astype(np.float32)
        mats = np.asarray(R.rot6d_to_rotmat(jnp.asarray(x)))
        assert_rotation(mats)

    def test_roundtrip(self, rng):
        mats = random_rotmats(rng)
        six = R.rotmat_to_rot6d(jnp.asarray(mats))
        back = np.asarray(R.rot6d_to_rotmat(six))
        np.testing.assert_allclose(back, mats, atol=1e-5)


class TestGramSchmidt:
    def test_identity_on_exact_rotations(self, rng):
        mats = random_rotmats(rng)
        out = np.asarray(R.unbiased_gram_schmidt(jnp.asarray(mats)))
        np.testing.assert_allclose(out, mats, atol=1e-4)

    def test_orthonormalizes_noisy(self, rng):
        mats = random_rotmats(rng) + rng.randn(32, 3, 3).astype(np.float32) * 0.05
        out = np.asarray(R.unbiased_gram_schmidt(jnp.asarray(mats)))
        assert_rotation(out, atol=1e-4)

    def test_keeps_k_axis_shape(self, rng):
        mats = random_rotmats(rng, 24).reshape(1, 24, 3, 3)
        out = np.asarray(R.unbiased_gram_schmidt(jnp.asarray(mats)))
        assert out.shape == (1, 24, 3, 3)


class TestQuat:
    def test_rotmat_quat_roundtrip(self, rng):
        mats = random_rotmats(rng)
        q = R.rotmat_to_quat(jnp.asarray(mats))
        back = np.asarray(R.quat_to_rotmat(q))
        np.testing.assert_allclose(back, mats, atol=1e-4)

    def test_angle_axis_roundtrip(self, rng):
        aa = rng.uniform(-1.5, 1.5, size=(64, 3)).astype(np.float32)
        mats = R.batch_rodrigues(jnp.asarray(aa))
        back = np.asarray(R.rotmat_to_angle_axis(mats))
        np.testing.assert_allclose(back, aa, atol=1e-3)

    def test_angle_axis_near_identity(self):
        mats = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
        aa = np.asarray(R.rotmat_to_angle_axis(mats))
        np.testing.assert_allclose(aa, 0.0, atol=1e-5)
        assert not np.any(np.isnan(aa))


class TestEuler:
    def test_matches_intrinsic_xyz(self, rng):
        angles = rng.uniform(-0.6, 0.6, size=(16, 3)).astype(np.float32)
        ours = np.asarray(R.euler_to_rotmat(jnp.asarray(angles)))
        ref = ScipyRot.from_euler("XYZ", angles).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_pitch_roll_form(self, rng):
        # The CamCalib path builds euler [pitch, 0, roll] (whmr.py:520-522).
        pitch, roll = 0.3, -0.2
        out = np.asarray(R.euler_to_rotmat(jnp.asarray([[pitch, 0.0, roll]])))[0]
        rx = ScipyRot.from_euler("x", pitch).as_matrix()
        rz = ScipyRot.from_euler("z", roll).as_matrix()
        np.testing.assert_allclose(out, rx @ rz, atol=1e-5)


class TestGradients:
    def test_rot6d_grad_finite(self, rng):
        import jax

        x = jnp.asarray(rng.randn(8, 6).astype(np.float32))
        g = jax.grad(lambda v: jnp.sum(R.rot6d_to_rotmat(v) ** 2))(x)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_rodrigues_grad_finite(self, rng):
        import jax

        x = jnp.asarray(rng.randn(8, 3).astype(np.float32) * 0.5)
        g = jax.grad(lambda v: jnp.sum(R.batch_rodrigues(v)))(x)
        assert np.all(np.isfinite(np.asarray(g)))
