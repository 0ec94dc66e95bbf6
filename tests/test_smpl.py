"""SMPL LBS correctness: golden numpy cross-check + geometric invariants.

SURVEY.md §7 ranks SMPL numerical parity as the #1 risk; these tests pin the
LBS math against an independently-written per-sample numpy implementation of
the published SMPL equations, plus physical invariants (rest pose, rigid
global rotation about the root).
"""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyRot

from whmr_tpu.data.assets import synthetic_smpl_assets
from whmr_tpu.models.smpl import (
    SMPLParams,
    smpl_forward,
    smpl_params_from_assets,
    vertices2joints,
    select_h36m_j14,
)


def numpy_lbs_reference(assets, betas, rotmats):
    """Independent per-sample implementation of the SMPL equations
    (Loper et al. 2015, eq. 2-7), written directly from the paper's math."""
    v_template = assets.v_template.astype(np.float64)
    shapedirs = assets.shapedirs.astype(np.float64)
    posedirs = assets.posedirs.astype(np.float64)
    j_reg = assets.j_regressor.astype(np.float64)
    weights = assets.lbs_weights.astype(np.float64)
    parents = assets.parents

    out_v, out_j = [], []
    for b in range(betas.shape[0]):
        beta = betas[b].astype(np.float64)
        rots = rotmats[b].astype(np.float64)

        v_shaped = v_template + shapedirs @ beta
        j_rest = j_reg @ v_shaped
        pose_feat = (rots[1:] - np.eye(3)).reshape(-1)
        v_posed = v_shaped + (pose_feat @ posedirs).reshape(-1, 3)

        # forward kinematics with homogeneous transforms
        transforms = np.zeros((24, 4, 4))
        for k in range(24):
            local = np.eye(4)
            local[:3, :3] = rots[k]
            if parents[k] < 0:
                local[:3, 3] = j_rest[k]
                transforms[k] = local
            else:
                local[:3, 3] = j_rest[k] - j_rest[parents[k]]
                transforms[k] = transforms[parents[k]] @ local
        j_posed = transforms[:, :3, 3].copy()
        # remove rest-pose joint location
        rel = transforms.copy()
        for k in range(24):
            rel[k, :3, 3] -= rel[k, :3, :3] @ j_rest[k]
        t_per_v = np.einsum("vk,kij->vij", weights, rel)
        vh = np.concatenate([v_posed, np.ones((v_posed.shape[0], 1))], axis=1)
        verts = np.einsum("vij,vj->vi", t_per_v, vh)[:, :3]
        out_v.append(verts)
        out_j.append(j_posed)
    return np.stack(out_v), np.stack(out_j)


class TestLBS:
    def setup_method(self):
        self.assets = synthetic_smpl_assets()
        self.params = smpl_params_from_assets(self.assets)

    def test_rest_pose_is_shaped_template(self, rng):
        betas = jnp.zeros((2, 10))
        rots = jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3))
        out = smpl_forward(self.params, betas, rots)
        np.testing.assert_allclose(
            np.asarray(out.vertices[0]), self.assets.v_template, atol=1e-5
        )

    def test_shape_blend_only(self, rng):
        betas = jnp.asarray(rng.randn(3, 10).astype(np.float32))
        rots = jnp.broadcast_to(jnp.eye(3), (3, 24, 3, 3))
        out = smpl_forward(self.params, betas, rots)
        expected = self.assets.v_template[None] + np.einsum(
            "bl,mkl->bmk", np.asarray(betas), self.assets.shapedirs
        )
        np.testing.assert_allclose(np.asarray(out.vertices), expected, atol=1e-5)

    def test_global_rotation_is_rigid_about_root(self, rng):
        """R at joint 0 only -> verts rotate rigidly about the root joint."""
        betas = jnp.zeros((1, 10))
        rot = ScipyRot.random(1, random_state=rng).as_matrix().astype(np.float32)
        rots = np.broadcast_to(np.eye(3, dtype=np.float32), (1, 24, 3, 3)).copy()
        rots[:, 0] = rot
        out = smpl_forward(self.params, betas, jnp.asarray(rots))
        rest = smpl_forward(
            self.params, betas, jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3))
        )
        root = np.asarray(rest.joints_kin[0, 0])
        expected = (np.asarray(rest.vertices[0]) - root) @ rot[0].T + root
        np.testing.assert_allclose(np.asarray(out.vertices[0]), expected, atol=1e-4)

    def test_matches_numpy_golden(self, rng):
        """Full random pose/shape against the independent numpy LBS."""
        b = 4
        betas = rng.randn(b, 10).astype(np.float32) * 0.5
        aa = rng.randn(b, 24, 3).astype(np.float32) * 0.3
        rotmats = ScipyRot.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(b, 24, 3, 3).astype(np.float32)
        out = smpl_forward(self.params, jnp.asarray(betas), jnp.asarray(rotmats))
        ref_v, ref_j = numpy_lbs_reference(self.assets, betas, rotmats)
        np.testing.assert_allclose(np.asarray(out.vertices), ref_v, atol=2e-4)
        np.testing.assert_allclose(np.asarray(out.joints_kin), ref_j, atol=2e-4)

    def test_joint_set_shapes(self, rng):
        out = smpl_forward(
            self.params, jnp.zeros((2, 10)), jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3))
        )
        assert out.joints.shape == (2, 49, 3)
        assert out.joints_smpl.shape == (2, 45, 3)
        assert out.vertices.shape == (2, 6890, 3)

    def test_joint49_map_semantics(self, rng):
        """'OP MidHip' (index 8) must be the pelvis kinematic joint."""
        out = smpl_forward(
            self.params, jnp.zeros((1, 10)), jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3))
        )
        np.testing.assert_allclose(
            np.asarray(out.joints[0, 8]), np.asarray(out.joints_kin[0, 0]), atol=1e-6
        )

    def test_h36m_selector_pelvis_centered(self, rng):
        out = smpl_forward(
            self.params, jnp.zeros((2, 10)), jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3))
        )
        j14 = select_h36m_j14(
            jnp.asarray(self.assets.j_regressor_h36m), out.vertices
        )
        assert j14.shape == (2, 14, 3)

    def test_differentiable(self, rng):
        import jax

        params = self.params
        betas = jnp.asarray(rng.randn(2, 10).astype(np.float32) * 0.1)

        def loss(bt):
            out = smpl_forward(params, bt, jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3)))
            return jnp.sum(out.vertices**2)

        g = jax.grad(loss)(betas)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_jit_compiles(self, rng):
        import jax

        f = jax.jit(lambda b, r: smpl_forward(self.params, b, r).vertices)
        v = f(jnp.zeros((2, 10)), jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3)))
        assert v.shape == (2, 6890, 3)
