"""W-HMR multi-term training loss, batched and mask-based.

Re-implements the reference loss stack (core/trainer.py:203-320 definitions,
:466-609 assembly) with one structural change for TPU: every "select the
valid samples then reduce" pattern (boolean indexing like
`pred_vertices[has_smpl]`, trainer.py:236-238) becomes a masked weighted
mean — identical value, but static shapes so the whole loss is one XLA
program.

Loss terms per MAF step l_i (the init step 0 is skipped, trainer.py:510-513):
  pose/beta MSE on valid-SMPL samples (x POSE_W / SHAPE_W)
  2D keypoint crop + world reprojection (conf-weighted, x KP_2D_W)
  3D keypoint MSE pelvis-aligned (x KP_3D_W)
  per-vertex L1 at 3 mesh scales (x VERT_W, only l_i > 2)
  camera depth regularizer exp(-10 s)^2
  focal-length MSE (FOCAL_SUPV_ON)
plus the IUV cross-entropy / smooth-L1 aux terms and depth smooth-L1.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from whmr_tpu.config import WHMRConfig
from whmr_tpu.ops.rotation import batch_rodrigues


def _masked_mean(err: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of err over samples where mask=1 (0 if none valid).

    Equivalent to the reference's `err[mask].mean()` with static shapes:
    per-sample errors are averaged over their own elements first, then over
    the valid samples.
    """
    per_sample = err.reshape(err.shape[0], -1).mean(axis=1)
    mask = mask.astype(per_sample.dtype)
    denom = jnp.maximum(mask.sum(), 1.0)
    return jnp.sum(per_sample * mask) / denom * jnp.minimum(mask.sum(), 1.0)


def keypoint_loss(
    pred_kp: jnp.ndarray,
    gt_kp: jnp.ndarray,
    openpose_weight: float,
    gt_weight: float,
    scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Confidence-weighted 2D MSE (trainer.py:203-213). gt_kp: (B, 49, 3)."""
    conf = gt_kp[..., 2:3]
    conf = jnp.concatenate(
        [conf[:, :25] * openpose_weight, conf[:, 25:] * gt_weight], axis=1
    )
    err = conf * (pred_kp - gt_kp[..., :2]) ** 2
    if scale is not None:
        err = err * scale
    return err.mean()


def keypoint_3d_loss(
    pred_kp3d: jnp.ndarray, gt_kp3d: jnp.ndarray, has_pose_3d: jnp.ndarray
) -> jnp.ndarray:
    """Pelvis-aligned 3D keypoint MSE on the GT-joint slice
    (trainer.py:217-234): joints 25:, pelvis = mean(hips at idx 2,3)."""
    pred = pred_kp3d[:, 25:, :]
    conf = gt_kp3d[..., 3:4]
    gt = gt_kp3d[..., :3]
    gt_pelvis = (gt[:, 2:3, :] + gt[:, 3:4, :]) / 2
    pred_pelvis = (pred[:, 2:3, :] + pred[:, 3:4, :]) / 2
    err = conf * (pred - pred_pelvis - (gt - gt_pelvis)) ** 2
    return _masked_mean(err, has_pose_3d)


def smpl_param_loss(
    pred_rotmat: jnp.ndarray,
    pred_betas: jnp.ndarray,
    gt_pose_aa: jnp.ndarray,
    gt_betas: jnp.ndarray,
    has_smpl: jnp.ndarray,
):
    """MSE on rotation matrices + betas for valid samples (trainer.py:244-258)."""
    gt_rotmat = batch_rodrigues(gt_pose_aa.reshape(-1, 3)).reshape(-1, 24, 3, 3)
    pose_err = (pred_rotmat - gt_rotmat) ** 2
    beta_err = (pred_betas - gt_betas) ** 2
    return _masked_mean(pose_err, has_smpl), _masked_mean(beta_err, has_smpl)


def vertex_loss(
    pred_verts: jnp.ndarray, gt_verts: jnp.ndarray, has_smpl: jnp.ndarray
) -> jnp.ndarray:
    """Per-vertex L1 (criterion_shape = nn.L1Loss, trainer.py:236-242)."""
    return _masked_mean(jnp.abs(pred_verts - gt_verts), has_smpl)


def iuv_losses(
    u_pred: jnp.ndarray,
    v_pred: jnp.ndarray,
    index_pred: jnp.ndarray,
    ann_pred: jnp.ndarray,
    uvia_gt: Dict[str, jnp.ndarray],
    has_iuv: jnp.ndarray,
    point_regression_weight: float,
):
    """DensePose-style aux losses (trainer.py:260-301), NHWC maps.

    uvia_gt: dict with 'u' (B,H,W,25), 'v' (B,H,W,25), 'index' (B,H,W,25
    one-hot), 'ann' (B,H,W,15 one-hot).
    """
    b = index_pred.shape[0]
    mask = has_iuv.astype(jnp.float32)
    denom = jnp.maximum(mask.sum(), 1.0)
    gate = jnp.minimum(mask.sum(), 1.0)

    def onehot_ce(logits, onehot_target):
        # The GT maps are exact one-hots (iuv_img2map), so CE reduces to
        # logsumexp(logits) - <onehot, logits> — identical to
        # softmax_cross_entropy_with_integer_labels(logits, argmax(gt)) but
        # without the argmax + per-row gather, which measured 5x slower on
        # TPU for these (B, H*W, 25) shapes (channel dim on lanes).
        logits = logits.astype(jnp.float32)
        lse = jax.nn.logsumexp(logits, axis=-1)
        picked = jnp.sum(logits * onehot_target.astype(jnp.float32), axis=-1)
        return (lse - picked).reshape(b, -1).mean(axis=1)

    # Part-index CE over all pixels of valid samples.
    ce = onehot_ce(index_pred, uvia_gt["index"])
    loss_index = jnp.sum(ce * mask) / denom * gate

    ce_a = onehot_ce(ann_pred, uvia_gt["ann"])
    loss_ann = jnp.sum(ce_a * mask) / denom * gate

    if point_regression_weight > 0 and u_pred is not None:
        # Smooth-L1 on U/V at each pixel's GT one-hot channel (the
        # reference's `u_pred[Imap > 0]` selects exactly one channel per
        # pixel, including channel 0 -> target 0 on background), summed and
        # divided by the FULL batch size — `batch_size = index_pred.size(0)`
        # is captured BEFORE the has_iuv masking (trainer.py:256,282-283),
        # so invalid samples dilute the term rather than renormalizing it.
        fg = (uvia_gt["index"] > 0).astype(u_pred.dtype)
        hub_u = optax.losses.huber_loss(u_pred, uvia_gt["u"], delta=1.0) * fg
        hub_v = optax.losses.huber_loss(v_pred, uvia_gt["v"], delta=1.0) * fg
        valid4 = mask[:, None, None, None]
        full_b = jnp.float32(b)
        loss_u = jnp.sum(hub_u * valid4) / full_b * point_regression_weight
        loss_v = jnp.sum(hub_v * valid4) / full_b * point_regression_weight
    else:
        loss_u = jnp.float32(0)
        loss_v = jnp.float32(0)
    return loss_u, loss_v, loss_index, loss_ann


def depth_loss(
    pred_depth: jnp.ndarray,
    gt_depth: jnp.ndarray,
    has_depth: jnp.ndarray,
    point_regression_weight: float,
) -> jnp.ndarray:
    """Smooth-L1 inverse-depth loss over valid samples (trainer.py:301-318).

    The reference sums over the valid samples' pixels and divides by the
    FULL batch size (`batch_size` is captured before the valid_fit mask,
    trainer.py:302,312) — replicated here with a masked sum.
    """
    mask = has_depth.astype(jnp.float32)
    hub = optax.losses.huber_loss(pred_depth, gt_depth, delta=1.0)
    per = hub.reshape(hub.shape[0], -1).sum(axis=1)
    batch = jnp.float32(pred_depth.shape[0])
    return jnp.sum(per * mask) / batch * point_regression_weight * jnp.minimum(mask.sum(), 1.0)


def hmr_loss(
    cfg: WHMRConfig,
    pred_rotmat: jnp.ndarray,
    pred_betas: jnp.ndarray,
    pred_cam: jnp.ndarray,
    pred_kp_2d: jnp.ndarray,
    pred_kp_3d: jnp.ndarray,
    batch: Dict[str, jnp.ndarray],
) -> Dict[str, jnp.ndarray]:
    """Loss subset for the plain HMR baseline (`--regressor hmr`).

    The reference selects this path via train_options.py:19-20 and runs the
    shared assembly loop once (trainer.py:498 `len_loop = 1`): SMPL param
    MSE + crop-frame 2D keypoints + pelvis-aligned 3D keypoints + the
    positive-depth camera regularizer. No world/aux/focal/vertex terms:
    HMR has no world branch or dense heads, the vertex losses are gated
    `l_i > 2` (never true at l_i=0), and the reference's own hmr branch
    leaves the projection undefined (the SMPL-forward block at
    trainer.py:527-530 is commented out — a shipped-state staleness we
    standardize rather than replicate, SURVEY §1 caveat): the projections
    here are computed the way the pymaf path computes them.
    """
    w = cfg.loss
    loss_dict: Dict[str, jnp.ndarray] = {}
    lp, lb = smpl_param_loss(
        pred_rotmat, pred_betas, batch["pose"], batch["betas"], batch["has_smpl"]
    )
    loss_dict["loss_regr_pose_0"] = lp * w.pose_w
    loss_dict["loss_regr_betas_0"] = lb * w.shape_w
    if w.kp_2d_w > 0:
        loss_dict["loss_keypoints_0"] = (
            keypoint_loss(
                pred_kp_2d, batch["keypoints"],
                w.openpose_train_weight, w.gt_train_weight,
            )
            * w.kp_2d_w
        )
    loss_dict["loss_keypoints_3d_0"] = (
        keypoint_3d_loss(pred_kp_3d, batch["pose_3d"], batch["has_pose_3d"])
        * w.kp_3d_w
    )
    loss_dict["loss_cam_0"] = jnp.mean(jnp.exp(-pred_cam[:, 0] * 10) ** 2)
    loss_dict["loss"] = sum(v for k, v in loss_dict.items() if k != "loss")
    return loss_dict


def whmr_loss(
    cfg: WHMRConfig,
    preds: Dict,
    batch: Dict[str, jnp.ndarray],
    gt_vertices: jnp.ndarray,
    gt_sub_vertices: jnp.ndarray,
    gt_temp_vertices: jnp.ndarray,
    uvia_gt: Optional[Dict[str, jnp.ndarray]] = None,
    depth_gt: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Full loss assembly over all MAF steps (trainer.py:466-609).

    Args:
      preds: WHMR forward output dict.
      batch: GT fields — keypoints (B,49,3 crop-norm), keypoints_world,
        pose (B,72), betas (B,10), pose_3d (B,24,4), has_smpl, has_pose_3d,
        focal (B,), bbox_height/bbox_width/orig_shape for the world-kp scale.
    """
    w = cfg.loss
    loss_dict: Dict[str, jnp.ndarray] = {}

    # World-keypoint loss rescale (trainer.py:501-508): orig/bbox, xy-swapped.
    res_scale = jnp.stack([batch["bbox_height"], batch["bbox_width"]], axis=1)
    kp_scale = batch["orig_shape"] / res_scale
    kp_scale = kp_scale[:, ::-1][:, None, :]  # (B, 1, 2) [W_ratio, H_ratio]

    smpl_out = preds["smpl_out"]
    for l_i in range(1, len(smpl_out)):
        out = smpl_out[l_i]
        pred_rotmat = out["rotmat"]
        pred_betas = out["pred_shape"]
        pred_cam = out["pred_cam"]
        # The appended Graphormer stage carries the LAST parametric step's
        # rotmat/shape/cam unchanged (models/whmr.py _graphormer_stage);
        # scoring them again would double that step's parametric gradient.
        # Only its refined vertices/keypoints are supervised (reference
        # supervises the non-parametric branch the same way).
        nonparam = cfg.pymaf.grph_on and l_i == len(smpl_out) - 1

        if not nonparam:
            lp, lb = smpl_param_loss(
                pred_rotmat, pred_betas, batch["pose"], batch["betas"], batch["has_smpl"]
            )
            loss_dict[f"loss_regr_pose_{l_i}"] = lp * w.pose_w
            loss_dict[f"loss_regr_betas_{l_i}"] = lb * w.shape_w

        if w.kp_2d_w > 0:
            loss_dict[f"loss_keypoints_{l_i}"] = (
                keypoint_loss(
                    out["kp_2d"], batch["keypoints"],
                    w.openpose_train_weight, w.gt_train_weight,
                )
                * w.kp_2d_w
            )
            loss_dict[f"loss_keypoints_world_{l_i}"] = (
                keypoint_loss(
                    out["kp_2d_w"], batch["keypoints_world"],
                    w.openpose_train_weight, w.gt_train_weight, scale=kp_scale,
                )
                * w.kp_2d_w
            )

        if cfg.pymaf.focal_supv_on and not nonparam:
            loss_dict[f"loss_focal_length_{l_i}"] = (
                jnp.mean((out["focal_length"] - batch["focal"]) ** 2) * w.focal_weights
            )

        # kp_3d is the 49-joint set during training (J_regressor=None path);
        # the loss slices off the 24 GT joints (trainer.py:217-218).
        loss_dict[f"loss_keypoints_3d_{l_i}"] = (
            keypoint_3d_loss(out["kp_3d"], batch["pose_3d"], batch["has_pose_3d"])
            * w.kp_3d_w
        )

        if w.vert_w > 0 and l_i > 2:
            loss_dict[f"loss_shape_{l_i}"] = (
                vertex_loss(out["verts"], gt_vertices, batch["has_smpl"]) * w.vert_w
            )
            loss_dict[f"loss_shape_sub_{l_i}"] = (
                vertex_loss(out["sub_verts"], gt_sub_vertices, batch["has_smpl"]) * w.vert_w
            )
            loss_dict[f"loss_shape_temp_{l_i}"] = (
                vertex_loss(out["temp_verts"], gt_temp_vertices, batch["has_smpl"]) * w.vert_w
            )

        # Positive-depth camera regularizer (trainer.py:586-588).
        if not nonparam:
            loss_dict[f"loss_cam_{l_i}"] = jnp.mean(jnp.exp(-pred_cam[:, 0] * 10) ** 2)

    if uvia_gt is not None and preds["dp_out"]:
        dp = preds["dp_out"][-1]
        lu, lv, lidx, lann = iuv_losses(
            dp["predict_u"], dp["predict_v"], dp["predict_uv_index"],
            dp["predict_ann_index"], uvia_gt, batch["has_smpl"],
            w.point_regression_weights,
        )
        loss_dict["loss_U"] = lu
        loss_dict["loss_V"] = lv
        loss_dict["loss_IndexUV"] = lidx * w.index_weights
        loss_dict["loss_segAnn"] = lann * w.part_weights

    # Depth-map supervision (trainer.py:489-495): smooth-L1 on the predicted
    # inverse-depth map vs the GT render, per dpth_out level.
    if depth_gt is not None and preds.get("dpth_out"):
        loss_dict["loss_Depth"] = depth_loss(
            preds["dpth_out"][-1], depth_gt, batch["has_smpl"],
            w.point_regression_weights,
        )

    loss_dict["loss"] = sum(
        v for k, v in loss_dict.items() if k != "loss"
    )
    return loss_dict
