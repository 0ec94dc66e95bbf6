"""SMPL body model as a pure function over a constant array bundle.

Replaces the reference's stateful `pare.models.SMPL` nn.Module (constructed
once per Regressor, whmr.py:59) with a functional LBS kernel: the model data
is a pytree of constants closed over by the jitted graph, and the forward is
nothing but batched matmuls + a fixed 24-step kinematic chain — exactly the
shape of computation the MXU wants.

Semantics match smplx.lbs.lbs + pare's 49-joint head:
  1. v_shaped = v_template + shapedirs . betas            (shape blend)
  2. J = J_regressor v_shaped                              (rest joints)
  3. v_posed = v_shaped + posedirs^T . vec(R[1:] - I)      (pose blend)
  4. A_k = A_parent(k) . [R_k | J_k - J_parent(k)]         (chain)
  5. verts = (sum_k w_k A'_k) v_posed                      (skinning)
  6. joints49 = joint_map( [J_posed ; verts[extra_ids] ; J_extra verts] )

Reference call sites: whmr.py:132-137 (Regressor SMPL fwd), whmr.py:186-187
(raw J_regressor + vertex selector), whmr.py:641-644 (world-frame fwd).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np
from jax import lax

from whmr_tpu.data.assets import SMPLAssets

_HI = lax.Precision.HIGHEST


class SMPLOutput(NamedTuple):
    vertices: jnp.ndarray       # (B, 6890, 3)
    joints: jnp.ndarray         # (B, 49, 3) pare-style joint set
    joints_smpl: jnp.ndarray    # (B, 45, 3) smplx joint set (24 kin + 21 vtx)
    joints_kin: jnp.ndarray     # (B, 24, 3) posed kinematic joints


class SMPLParams(NamedTuple):
    """Device-resident constant bundle (pytree leaf arrays)."""

    v_template: jnp.ndarray
    shapedirs: jnp.ndarray       # (6890, 3, 10)
    posedirs: jnp.ndarray        # (207, 6890*3)
    j_regressor: jnp.ndarray     # (24, 6890)
    lbs_weights: jnp.ndarray     # (6890, 24)
    j_regressor_extra: jnp.ndarray  # (9, 6890)
    vertex_joint_ids: jnp.ndarray   # (21,)
    joint_map: jnp.ndarray          # (49,)


def smpl_params_from_assets(assets: SMPLAssets, dtype=jnp.float32) -> SMPLParams:
    return SMPLParams(
        v_template=jnp.asarray(assets.v_template, dtype),
        shapedirs=jnp.asarray(assets.shapedirs, dtype),
        posedirs=jnp.asarray(assets.posedirs, dtype),
        j_regressor=jnp.asarray(assets.j_regressor, dtype),
        lbs_weights=jnp.asarray(assets.lbs_weights, dtype),
        j_regressor_extra=jnp.asarray(assets.j_regressor_extra, dtype),
        vertex_joint_ids=jnp.asarray(assets.vertex_joint_ids, jnp.int32),
        joint_map=jnp.asarray(assets.joint_map, jnp.int32),
    )


def smpl_forward(
    params: SMPLParams,
    betas: jnp.ndarray,
    rotmats: jnp.ndarray,
    precision=None,
) -> SMPLOutput:
    """Batched SMPL LBS.

    Args:
      params: constant model bundle.
      betas: (B, 10) shape coefficients.
      rotmats: (B, 24, 3, 3) per-joint rotation matrices (global orient at
        index 0) — the `pose2rot=False` path the reference always uses
        (whmr.py:132-137).

    Returns:
      SMPLOutput with camera-frame vertices and joint sets.
    """
    b = betas.shape[0]
    dtype = betas.dtype

    # 1. Shape blend: (B,10) x (6890,3,10) -> (B, 6890, 3).
    v_shaped = params.v_template[None] + jnp.einsum(
        "bl,mkl->bmk", betas, params.shapedirs, precision=precision or _HI
    )

    # 2. Rest joints: (24, 6890) x (B, 6890, 3).
    j_rest = jnp.einsum(
        "jv,bvk->bjk", params.j_regressor, v_shaped, precision=precision or _HI
    )

    # 3. Pose blend: vec(R[1:] - I) (B, 207) x (207, 6890*3).
    eye = jnp.eye(3, dtype=dtype)
    pose_feature = (rotmats[:, 1:] - eye).reshape(b, 207)
    v_posed = v_shaped + jnp.matmul(
        pose_feature, params.posedirs, precision=precision or _HI
    ).reshape(b, -1, 3)

    # 4. Kinematic chain — 24 fixed steps, unrolled at trace time. The
    # parent table is a topological constant of the SMPL family (identical
    # for every gender/model file), so it is baked in statically rather than
    # carried in the traced pytree.
    from whmr_tpu.data.assets import SMPL_PARENTS

    parents = SMPL_PARENTS
    rel_j = j_rest - jnp.where(
        (parents >= 0)[None, :, None],
        j_rest[:, np.maximum(parents, 0)],
        0.0,
    )

    rots = []
    transls = []
    # World transform of joint k: R_w[k] = R_w[p] R_k ; t_w[k] = R_w[p] rel_j[k] + t_w[p]
    for k in range(parents.shape[0]):
        p = int(parents[k])
        if p < 0:
            rots.append(rotmats[:, 0])
            transls.append(j_rest[:, 0])
        else:
            rots.append(
                jnp.matmul(rots[p], rotmats[:, k], precision=precision or _HI)
            )
            transls.append(
                jnp.einsum(
                    "bij,bj->bi", rots[p], rel_j[:, k], precision=precision or _HI
                )
                + transls[p]
            )
    rot_w = jnp.stack(rots, axis=1)      # (B, 24, 3, 3)
    j_posed = jnp.stack(transls, axis=1)  # (B, 24, 3)

    # 5. Skinning. Relative transforms remove the rest-pose joint location:
    #    A'_k x = R_w[k] x + (t_w[k] - R_w[k] j_rest[k]).
    t_rel = j_posed - jnp.einsum(
        "bkij,bkj->bki", rot_w, j_rest, precision=precision or _HI
    )
    # Blend per-vertex: W (6890,24) against (B,24,12) packed transforms.
    packed = jnp.concatenate([rot_w.reshape(b, 24, 9), t_rel], axis=-1)  # (B,24,12)
    blended = jnp.einsum(
        "vk,bkm->bvm", params.lbs_weights, packed, precision=precision or _HI
    )
    rot_v = blended[..., :9].reshape(b, -1, 3, 3)
    t_v = blended[..., 9:]
    vertices = (
        jnp.einsum("bvij,bvj->bvi", rot_v, v_posed, precision=precision or _HI) + t_v
    )

    # 6. Joint sets.
    extra_vtx = vertices[:, params.vertex_joint_ids]          # (B, 21, 3)
    joints_smpl = jnp.concatenate([j_posed, extra_vtx], axis=1)  # (B, 45, 3)
    extra_reg = jnp.einsum(
        "jv,bvk->bjk", params.j_regressor_extra, vertices, precision=precision or _HI
    )  # (B, 9, 3)
    joints54 = jnp.concatenate([joints_smpl, extra_reg], axis=1)
    joints49 = joints54[:, params.joint_map]

    return SMPLOutput(
        vertices=vertices,
        joints=joints49,
        joints_smpl=joints_smpl,
        joints_kin=j_posed,
    )


def vertices2joints(j_regressor: jnp.ndarray, vertices: jnp.ndarray) -> jnp.ndarray:
    """(J, V) x (B, V, 3) -> (B, J, 3) (smplx.lbs.vertices2joints)."""
    return jnp.einsum("jv,bvk->bjk", j_regressor, vertices, precision=_HI)


def joints_from_vertices(params: SMPLParams, vertices: jnp.ndarray):
    """Joint sets regressed from arbitrary (e.g. refined) vertices.

    The Graphormer branch's joint path (e2e_body_network.py:91-97):
    J_regressor x verts -> 24 kinematic joints, vertex-selector extras,
    extra-regressor joints, pare 49-joint map. Returns (joints49,
    joints_smpl45).
    """
    j24 = jnp.einsum("jv,bvk->bjk", params.j_regressor, vertices, precision=_HI)
    extra_vtx = vertices[:, params.vertex_joint_ids]
    joints_smpl = jnp.concatenate([j24, extra_vtx], axis=1)  # (B, 45, 3)
    extra_reg = jnp.einsum(
        "jv,bvk->bjk", params.j_regressor_extra, vertices, precision=_HI
    )
    joints54 = jnp.concatenate([joints_smpl, extra_reg], axis=1)
    return joints54[:, params.joint_map], joints_smpl


def select_h36m_joints(
    j_regressor_h36m: jnp.ndarray, vertices: jnp.ndarray, mapper
) -> jnp.ndarray:
    """H36M regression -> pelvis-centered joint subset.

    Matches the eval protocol (reference eval.py:199-219 and whmr.py:176-180):
    17 H36M joints from vertices, pelvis = joint 0 BEFORE the mapper slice,
    select `mapper` (H36M_TO_J14 or H36M_TO_J17), subtract pelvis.
    """
    joints = vertices2joints(j_regressor_h36m, vertices)
    pelvis = joints[:, :1]
    return joints[:, jnp.asarray(mapper)] - pelvis


def select_h36m_j14(
    j_regressor_h36m: jnp.ndarray, vertices: jnp.ndarray
) -> jnp.ndarray:
    """Pelvis-centered 14 LSP joints (the default eval protocol)."""
    from whmr_tpu.data.assets import H36M_TO_J14

    return select_h36m_joints(j_regressor_h36m, vertices, H36M_TO_J14)
