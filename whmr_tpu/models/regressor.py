"""Iterative SMPL parameter regressor + world-frame global-orient regressor.

Reference counterparts: `Regressor` (whmr.py:42-269) and
`Global_Orient_Regressor` (whmr.py:272-305).

Each regressor step is a residual MLP over [point features | bbox_info |
θ | β | cam], producing Δpose(24x9 rotation-matrix entries)/Δshape/Δcam,
followed by an SMPL forward and the full projection bundle (crop-frame
weak-persp keypoints, full-image perspective keypoints with the Tz-derived
focal length, mesh downsampling, surface markers).

Training-stage stop_gradient gating replicates cfg.TRAIN.STAGE semantics
(whmr.py:142-171): stage 1 backprops through the crop-frame keypoints and
detaches the world branch; stage 2 is the reverse.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from whmr_tpu.data.assets import SMPLAssets
from whmr_tpu.models.smpl import (
    SMPLParams,
    smpl_forward,
    smpl_params_from_assets,
    vertices2joints,
    select_h36m_j14,
)
from whmr_tpu.ops.camera import (
    convert_pare_to_full_img_cam,
    perspective_projection,
    weak_perspective_projection,
)
from whmr_tpu.ops.rotation import (
    rot6d_to_rotmat,
    rotmat_to_angle_axis,
    rotmat_to_rot6d,
    unbiased_gram_schmidt,
)

NPOSE = 24 * 9

# torch xavier_uniform with gain g == variance_scaling(g^2, fan_avg, uniform)
# (reference init at whmr.py:55-57,281: gain 0.01 on the residual decoders).
def _xavier_gain(gain: float):
    return nn.initializers.variance_scaling(gain * gain, "fan_avg", "uniform")


class BodyConsts(NamedTuple):
    """Device-resident constants shared by all regressor steps."""

    smpl: SMPLParams
    dmap0: jnp.ndarray          # (1723, 6890)
    dmap1: jnp.ndarray          # (431, 1723)
    ssm: jnp.ndarray            # (67,)
    j_regressor_h36m: jnp.ndarray  # (17, 6890)
    mean_pose: jnp.ndarray      # (1, 216) rotmat entries of the mean pose
    mean_shape: jnp.ndarray     # (1, 10)
    mean_cam: jnp.ndarray       # (1, 3)
    # 431-vertex normalized adjacency for the Graphormer GCN (reference
    # data/smpl_431_adjmat_*.pt, _gcnn.py:132-138); None when unused.
    adj431: Optional[jnp.ndarray] = None


def body_consts_from_assets(
    assets: SMPLAssets, dtype=jnp.float32, adjacency_dir: Optional[str] = None
) -> BodyConsts:
    """Build the constant bundle (mean rot6d -> rotmat as whmr.py:64-65)."""
    from whmr_tpu.models.graphormer import build_adjacency

    mean_rotmat = rot6d_to_rotmat(jnp.asarray(assets.mean_pose_rot6d, dtype).reshape(1, -1))
    return BodyConsts(
        smpl=smpl_params_from_assets(assets, dtype),
        dmap0=jnp.asarray(assets.dmap0, dtype),
        dmap1=jnp.asarray(assets.dmap1, dtype),
        ssm=jnp.asarray(assets.ssm, jnp.int32),
        j_regressor_h36m=jnp.asarray(assets.j_regressor_h36m, dtype),
        mean_pose=mean_rotmat.reshape(1, NPOSE),
        mean_shape=jnp.asarray(assets.mean_shape, dtype).reshape(1, 10),
        mean_cam=jnp.asarray(assets.mean_cam, dtype).reshape(1, 3),
        adj431=jnp.asarray(build_adjacency(assets, adjacency_dir), dtype),
    )


class CamState(NamedTuple):
    """Per-sample camera/bbox context threaded through every step."""

    bbox_info: jnp.ndarray    # (B, 5)
    center: jnp.ndarray       # (B, 2) bbox center in full-image px
    scale: jnp.ndarray        # (B,)
    bbox_height: jnp.ndarray  # (B,)
    orig_shape: jnp.ndarray   # (B, 2) full image (H, W)
    tz: jnp.ndarray           # (B,) predicted body depth


def _smpl_out_bundle(
    consts: BodyConsts,
    pred_rotmat: jnp.ndarray,
    pred_shape: jnp.ndarray,
    pred_cam: jnp.ndarray,
    cam_state: Optional[CamState],
    img_res: Tuple[int, int],
    train: bool,
    stage: int,
    j_regressor: Optional[jnp.ndarray],
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """SMPL forward + the full output dict of a regressor step
    (mirrors whmr.py:132-208 / the forward_init subset when cam_state None).
    """
    out = smpl_forward(consts.smpl, pred_shape, pred_rotmat)
    pred_vertices = out.vertices
    pred_joints = out.joints

    # Crop-frame weak-perspective keypoints; stage 2 detaches the joints
    # (whmr.py:142-145).
    kp_src = pred_joints if (stage == 1 or not train) else lax.stop_gradient(pred_joints)
    pred_kp_2d = weak_perspective_projection(kp_src, pred_cam, img_res)

    pose_aa = rotmat_to_angle_axis(pred_rotmat.reshape(-1, 3, 3)).reshape(-1, 72)

    # Eval-time H36M-regressed J14 joints (whmr.py:176-180).
    if j_regressor is not None:
        kp3d = select_h36m_j14(j_regressor, pred_vertices)
    else:
        kp3d = pred_joints

    # precision=HIGHEST: geometry einsums must not run as bf16 matmul
    # passes on TPU (sub/temp verts are loss targets and Graphormer
    # inputs; bf16 accumulation is multi-mm noise) — same rule as every
    # einsum in smpl.py/camera.py.
    _hi = lax.Precision.HIGHEST
    sub_verts = jnp.einsum(
        "sv,bvk->bsk", consts.dmap0, pred_vertices, precision=_hi
    )
    temp_verts = jnp.einsum(
        "ts,bsk->btk", consts.dmap1, sub_verts, precision=_hi
    )
    markers = pred_vertices[:, consts.ssm]

    # smpl_kp_3d/pelvis are REGRESSED from the final vertices (reference
    # whmr.py:185-187: vertices2joints(J_regressor, verts) + vertex picks),
    # not the kinematic-chain joints — they differ under pose blendshapes,
    # and AGORA export consumes smpl_kp_3d (val_results.py:150).
    j24 = vertices2joints(consts.smpl.j_regressor, pred_vertices)
    smpl_kp_3d = jnp.concatenate(
        [j24, pred_vertices[:, consts.smpl.vertex_joint_ids]], axis=1
    )

    output = {
        "theta": jnp.concatenate([pred_cam, pred_shape, pose_aa], axis=1),
        "verts": pred_vertices,
        "sub_verts": sub_verts,
        "temp_verts": temp_verts,
        "kp_2d": pred_kp_2d,
        "kp_3d": kp3d,
        "smpl_kp_3d": smpl_kp_3d,
        "rotmat": pred_rotmat,
        "pred_cam": pred_cam,
        "pred_shape": pred_shape,
        "pose": pose_aa,
        "pelvis": smpl_kp_3d[:, :1, :],
        "markers": markers,
    }

    if cam_state is not None:
        s = lax.stop_gradient(pred_cam[:, 0])
        focal_length = s * cam_state.bbox_height * cam_state.tz / 2.0  # whmr.py:149
        img_h = cam_state.orig_shape[:, 0]
        img_w = cam_state.orig_shape[:, 1]
        camera_center = jnp.stack([img_w, img_h], axis=-1) / 2.0
        pred_cam_t = convert_pare_to_full_img_cam(
            lax.stop_gradient(pred_cam),
            cam_state.bbox_height,
            cam_state.center,
            img_w,
            img_h,
            tz=cam_state.tz,
        )
        # World (full-image) keypoints; stage 1 detaches joints (whmr.py:156-171).
        kp_w_src = lax.stop_gradient(pred_joints) if (stage == 1 and train) else pred_joints
        kp_2d_world = perspective_projection(
            kp_w_src, None, pred_cam_t, focal_length, camera_center
        )
        kp_2d_world = kp_2d_world / camera_center[:, None, :] - 1.0
        output.update(
            {
                "kp_2d_w": kp_2d_world,
                "pred_cam_t": pred_cam_t,
                "focal_length": focal_length,
                "scale": cam_state.scale,
            }
        )
    return output, out.vertices


class Regressor(nn.Module):
    """One MAF-step residual SMPL regressor (whmr.py:42-209)."""

    img_res: Tuple[int, int] = (256, 256)
    stage: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        consts: BodyConsts,
        feat: jnp.ndarray,
        cam_state: CamState,
        init_pose: jnp.ndarray,
        init_shape: jnp.ndarray,
        init_cam: jnp.ndarray,
        train: bool = False,
        n_iter: int = 1,
        j_regressor: Optional[jnp.ndarray] = None,
    ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
        """Returns (output dict, body_feat = [feat|bbox_info])."""
        x = jnp.concatenate([feat, cam_state.bbox_info.astype(feat.dtype)], axis=1)
        pred_pose = init_pose.reshape(x.shape[0], -1)
        pred_shape = init_shape
        pred_cam = init_cam

        fc1 = nn.Dense(1024, dtype=self.dtype, name="fc1")
        fc2 = nn.Dense(1024, dtype=self.dtype, name="fc2")
        decpose = nn.Dense(
            NPOSE, dtype=self.dtype, name="decpose", kernel_init=_xavier_gain(0.01)
        )
        decshape = nn.Dense(
            10, dtype=self.dtype, name="decshape", kernel_init=_xavier_gain(0.01)
        )
        deccam = nn.Dense(
            3, dtype=self.dtype, name="deccam", kernel_init=_xavier_gain(0.01)
        )
        drop = nn.Dropout(0.5, deterministic=not train)
        for _ in range(n_iter):
            xc = jnp.concatenate([x, pred_pose, pred_shape, pred_cam], axis=1)
            xc = drop(fc1(xc))
            xc = drop(fc2(xc))
            pred_pose = decpose(xc) + pred_pose
            pred_shape = decshape(xc) + pred_shape
            pred_cam = deccam(xc) + pred_cam

        pred_rotmat = pred_pose.reshape(-1, 24, 3, 3)
        if not train:
            # Eval-time orthonormalization (whmr.py:129-130).
            pred_rotmat = unbiased_gram_schmidt(pred_rotmat)

        output, _ = _smpl_out_bundle(
            consts, pred_rotmat, pred_shape, pred_cam, cam_state,
            self.img_res, train, self.stage, j_regressor,
        )
        output["pred_pose"] = pred_pose
        return output, x


def forward_init(
    consts: BodyConsts,
    batch_size: int,
    img_res: Tuple[int, int] = (256, 256),
    j_regressor: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Mean-parameter SMPL state used to seed the MAF loop (whmr.py:211-269).

    Parameter-free (the reference routes it through regressor[0] but touches
    no learned weights), so it lives outside the flax module.
    """
    pred_pose = jnp.broadcast_to(consts.mean_pose, (batch_size, NPOSE))
    pred_shape = jnp.broadcast_to(consts.mean_shape, (batch_size, 10))
    pred_cam = jnp.broadcast_to(consts.mean_cam, (batch_size, 3))
    pred_rotmat = pred_pose.reshape(batch_size, 24, 3, 3)
    output, _ = _smpl_out_bundle(
        consts, pred_rotmat, pred_shape, pred_cam, None, img_res, False, 2, j_regressor,
    )
    output["pred_pose"] = pred_pose
    return output


class GlobalOrientRegressor(nn.Module):
    """World-frame global-orientation head (whmr.py:272-305).

    Note a faithful replication detail: the reference's 3-step loop never
    feeds `pred_rot` back into `local_orient`, so each iteration sees the
    same inputs; with dropout off (eval) the loop is idempotent. We keep the
    same computation (3 dropout draws in training, single pass in eval).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        body_feat: jnp.ndarray,
        cam_rotmat: jnp.ndarray,
        local_orient: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        b = body_feat.shape[0]
        cam6d = rotmat_to_rot6d(cam_rotmat)
        local = local_orient.reshape(b, 9)
        n_iter = 3 if train else 1
        pred_rot = local
        fc1 = nn.Dense(2048, dtype=self.dtype, name="fc1")
        fc2 = nn.Dense(2048, dtype=self.dtype, name="fc2")
        decrot = nn.Dense(
            9, dtype=self.dtype, name="decrot", kernel_init=_xavier_gain(0.01)
        )
        drop = nn.Dropout(0.5, deterministic=not train)
        for _ in range(n_iter):
            xc = jnp.concatenate([body_feat, cam6d, local], axis=1)
            xc = drop(fc1(xc))
            xc = drop(fc2(xc))
            pred_rot = decrot(xc) + local
        pred_rot = pred_rot.reshape(-1, 1, 3, 3)
        if not train:
            pred_rot = unbiased_gram_schmidt(pred_rot)
        return pred_rot
