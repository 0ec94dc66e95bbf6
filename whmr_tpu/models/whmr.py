"""The full W-HMR graph: backbone -> deconv pyramid -> MAF loop -> heads.

TPU-native re-implementation of reference `models/whmr.py:308-678` (WHMR) as
one flax module whose apply is a single jittable program:

  1. CamCalib on the full image -> pitch/roll -> cam_rotmat (whmr.py:509-522)
  2. Backbone (ViT-B 16x12x768 or ResNet50 8x8x2048) on the person crop
  3. Mean-parameter SMPL init (whmr.py:550)
  4. Three deconv pyramid levels feeding three MAF steps (whmr.py:560-564)
  5. Tz transformer head -> per-sample focal length (whmr.py:566-577)
  6. MAF loop: grid sample (step 0) / 67-marker mesh-aligned sample (steps
     1-2) -> residual SMPL regression (whmr.py:580-627)
  7. Global-orientation regressor -> world-frame SMPL (whmr.py:630-654)
  8. IUV / depth auxiliary heads (whmr.py:656-662)

Fixes vs. the shipped reference (documented deviations, SURVEY.md §7
'bug-compat decisions'):
- forward returns BOTH the training out_list and the demo vis_dict; the
  reference returns only vis_dict with the training return commented out
  (whmr.py:676-678), leaving trainer/eval broken.
- `render_rotmat` is always defined (identity/cam_rotmat when CamCalib is
  skipped); the reference NameErrors in that branch (whmr.py:671).
"""

from __future__ import annotations

from dataclasses import field
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax

from whmr_tpu.config import WHMRConfig
from whmr_tpu.models.heads import DepthHead, IUVHead, TzHead
from whmr_tpu.models.layers import DeconvBlock
from whmr_tpu.models.maf import MAFExtractor
from whmr_tpu.models.regressor import (
    BodyConsts,
    CamState,
    GlobalOrientRegressor,
    Regressor,
    forward_init,
)
from whmr_tpu.models.resnet import CamCalibNet, PoseResNetEncoder
from whmr_tpu.models.smpl import (
    joints_from_vertices,
    select_h36m_j14,
    smpl_forward,
)
from whmr_tpu.models.vit import ViTBackbone
from whmr_tpu.ops.camera import (
    decode_cam_angles,
    perspective_projection,
    weak_perspective_projection,
)
from whmr_tpu.ops.rotation import euler_to_rotmat, rotmat_to_angle_axis


def make_points_grid(grid_hw) -> np.ndarray:
    """Fixed 2D sample grid of MAF step 0 (whmr.py:345-347).

    grid_hw = (grid_width, grid_height) per the reference naming: xv spans
    `grid_width` values, yv spans `grid_height`; 'ij' meshgrid then flatten.
    """
    gw, gh = grid_hw
    xv, yv = np.meshgrid(
        np.linspace(-1, 1, gw, dtype=np.float32),
        np.linspace(-1, 1, gh, dtype=np.float32),
        indexing="ij",
    )
    return np.stack([xv.reshape(-1), yv.reshape(-1)], axis=-1)  # (gw*gh, 2)


class WHMR(nn.Module):
    cfg: WHMRConfig
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    def setup(self):
        c = self.cfg
        # The global-orient head consumes the marker-step body feature
        # (2144+5-d), which only exists from the second MAF step on; the
        # reference likewise NameErrors below N_ITER=2 (whmr.py:608,631).
        assert 2 <= c.pymaf.n_iter <= 3, c.pymaf.n_iter
        if c.pymaf.backbone == "vitpose":
            self.feature_extractor = ViTBackbone(c.vit, dtype=self.dtype)
        else:
            # res50 mode mirrors the reference's COCO PoseResNet encoder
            # (whmr.py:317, pose_resnet.py:287-305) — feature map only; the
            # SPIN ResNetBackbone (hmr.py:57-161) stays the HMR baseline's.
            self.feature_extractor = PoseResNetEncoder(
                dtype=self.dtype, bn_axis_name=self.bn_axis_name
            )

        n_iter = c.pymaf.n_iter
        self.deconv_blocks = [
            DeconvBlock(
                c.deconv.num_filters[i],
                kernel=c.deconv.num_kernels[i],
                use_bias=c.deconv.with_bias,
                dtype=self.dtype,
                bn_axis_name=self.bn_axis_name,
                name=f"deconv{i}",
            )
            for i in range(c.deconv.num_layers)
        ]
        self.maf_extractors = [
            MAFExtractor(
                mlp_dim=tuple(c.pymaf.mlp_dim),
                img_res=c.img_res,
                dtype=self.dtype,
                name=f"maf{i}",
            )
            for i in range(n_iter)
        ]
        self.regressors = [
            Regressor(
                img_res=c.img_res,
                stage=c.train.stage,
                dtype=self.dtype,
                name=f"regressor{i}",
            )
            for i in range(3)
        ]
        self.tz_head = TzHead(
            first_stride=3 if c.pymaf.backbone == "vitpose" else 2,
            hidden=12 if c.pymaf.backbone == "vitpose" else 10,
            dtype=self.dtype,
            name="tz_head",
        )
        self.cam_model = CamCalibNet(
            dtype=self.dtype, bn_axis_name=self.bn_axis_name, name="cam_model"
        )
        self.global_orient = GlobalOrientRegressor(dtype=self.dtype, name="global_orient")
        if c.pymaf.grph_on:
            from whmr_tpu.models.graphormer import GraphormerBodyNetwork

            # Non-parametric refiner (reference slot whmr.py:363/613-626,
            # e2e_body_network.py:44-150). The reference's commented design
            # SUBSTITUTES it for the last MAF step; here it is APPENDED as a
            # 4th stage so the parametric chain and the refiner both train.
            self.graphormer = GraphormerBodyNetwork(
                dtype=self.dtype, name="transformer0"
            )
        if c.pymaf.aux_supv_on:
            self.dp_head = IUVHead(
                with_uv=c.loss.point_regression_weights > 0, dtype=self.dtype,
                name="dp_head",
            )
        if c.pymaf.depth_supv_on:
            self.dpth_head = DepthHead(dtype=self.dtype, name="dpth_head")

        self.points_grid = jnp.asarray(make_points_grid(self.cfg.points_grid_wh))

    def __call__(
        self,
        consts: BodyConsts,
        x: jnp.ndarray,
        center: jnp.ndarray,
        scale: jnp.ndarray,
        bbox_height: jnp.ndarray,
        orig_shape: jnp.ndarray,
        bbox_info: jnp.ndarray,
        train: bool = False,
        j_regressor: Optional[jnp.ndarray] = None,
        full_x: Optional[jnp.ndarray] = None,
        cam_rotmat: Optional[jnp.ndarray] = None,
        meta_masks: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        """Forward pass.

        Args:
          consts: BodyConsts bundle (SMPL model + downsampling + mean params).
          x: (B, H, W, 3) person crops, normalized (NHWC).
          center: (B, 2) bbox center in full-image pixels.
          scale: (B,) bbox scale (h/200 convention).
          bbox_height/orig_shape/bbox_info: per reference forward signature
            (whmr.py:503-504); orig_shape is (H, W).
          full_x: (B, Hc, Wc, 3) resized full images for CamCalib, or None.
          cam_rotmat: (B, 3, 3) ground-truth camera rotation, or None.
        """
        c = self.cfg
        batch_size = x.shape[0]
        n_iter = c.pymaf.n_iter

        # 1. Camera calibration (whmr.py:509-524). Angles are decoded with a
        # detached softargmax; render_rotmat flips pitch for the overlay
        # renderer (whmr.py:522).
        if cam_rotmat is None:
            if full_x is not None:
                cam_rotmat, render_rotmat = self.camcalib(full_x, train=train)
                if full_x.shape[0] == 1 and batch_size > 1:
                    # Demo path: all crops come from the SAME frame — ship
                    # the full image once and broadcast the camera rotation
                    # (the reference tiles it per person, tester.py:151-162).
                    cam_rotmat = jnp.broadcast_to(cam_rotmat, (batch_size, 3, 3))
                    render_rotmat = jnp.broadcast_to(render_rotmat, (batch_size, 3, 3))
            else:
                cam_rotmat = jnp.broadcast_to(
                    jnp.eye(3, dtype=x.dtype), (batch_size, 3, 3)
                )
                render_rotmat = cam_rotmat
        else:
            render_rotmat = cam_rotmat

        # 2. Backbone spatial features.
        s_feat = self.feature_extractor(x, train=train)

        # 3. Mean-parameter init (whmr.py:550).
        smpl_output = forward_init(consts, batch_size, c.img_res, j_regressor)
        out_smpl = [smpl_output]

        # 4. Deconv pyramid; each level feeds one MAF step (whmr.py:560-564).
        # ALL deconv layers always run — n_iter only regroups them into
        # pyramid levels (whmr.py:537-543: n_iter=2 -> [0:2],[2:3]), so the
        # final feature map is full resolution regardless of n_iter and the
        # param tree is n_iter-independent.
        n_layers = len(self.deconv_blocks)
        bounds = [round(n_layers * k / n_iter) for k in range(n_iter + 1)]
        level_feats = []
        for k in range(n_iter):
            for i in range(bounds[k], bounds[k + 1]):
                s_feat = self.deconv_blocks[i](s_feat, train=train)
            level_feats.append(s_feat)

        # 5. Tz head; stage 1 detaches the pyramid (whmr.py:567-570).
        tz_in = lax.stop_gradient(s_feat) if (c.train.stage == 1 and train) else s_feat
        tz = self.tz_head(tz_in, train=train)

        cam_state = CamState(
            bbox_info=bbox_info,
            center=center,
            scale=scale,
            bbox_height=bbox_height,
            orig_shape=orig_shape,
            tz=tz,
        )

        # 6. MAF loop (whmr.py:580-627).
        body_feat = None
        for rf_i in range(n_iter):
            pred_cam = lax.stop_gradient(smpl_output["pred_cam"])
            pred_shape = lax.stop_gradient(smpl_output["pred_shape"])
            pred_pose = lax.stop_gradient(smpl_output["rotmat"]).reshape(batch_size, -1)
            markers = lax.stop_gradient(smpl_output["markers"])

            maf = self.maf_extractors[rf_i]
            if rf_i == 0:
                pts = jnp.broadcast_to(
                    self.points_grid[None], (batch_size, *self.points_grid.shape)
                ).astype(s_feat.dtype)
                ref_feature, _ = maf.sampling(level_feats[rf_i], pts)
            else:
                ref_feature, _ = maf(level_feats[rf_i], markers, pred_cam)

            reg_out, feat_cat = self.regressors[rf_i](
                consts,
                ref_feature,
                cam_state,
                pred_pose,
                pred_shape,
                pred_cam,
                train=train,
                n_iter=1,
                j_regressor=j_regressor,
            )
            smpl_output = reg_out
            if rf_i > 0:
                body_feat = feat_cat
            out_smpl.append(smpl_output)

        # 6b. Graphormer vertex refinement (reference design at
        # whmr.py:613-626 / e2e_body_network.py:44-150): MAF-sample the 431
        # coarse vertices on the finest pyramid level, refine them
        # non-parametrically, recompute the joint/projection bundle.
        if c.pymaf.grph_on:
            refined = self._graphormer_stage(
                consts, level_feats[-1], smpl_output, body_feat,
                cam_state, meta_masks, train, j_regressor,
            )
            out_smpl.append(refined)

        # 7. Global orientation -> world SMPL (whmr.py:630-654).
        last_local_rotmat = smpl_output["rotmat"][:, 0]
        global_rotmat1 = self.global_orient(
            body_feat, cam_rotmat.astype(body_feat.dtype), last_local_rotmat, train=train
        )
        global_aa = rotmat_to_angle_axis(global_rotmat1.reshape(-1, 3, 3)).reshape(-1, 3)
        global_pose = jnp.concatenate([global_aa, smpl_output["pose"][:, 3:]], axis=1)
        global_full_rotmat = jnp.concatenate(
            [global_rotmat1, smpl_output["rotmat"][:, 1:]], axis=1
        )
        world_out = smpl_forward(
            consts.smpl, smpl_output["pred_shape"], global_full_rotmat
        )
        if j_regressor is not None:
            global_kp_3d = select_h36m_j14(j_regressor, world_out.vertices)
        else:
            global_kp_3d = world_out.joints

        global_output = {
            "global_pose": global_pose,
            "global_shape": smpl_output["pred_shape"],
            "global_rotmat": global_full_rotmat,
            "global_kp_3d": global_kp_3d,
            "global_verts": world_out.vertices,
        }

        out: Dict[str, Any] = {
            "smpl_out": out_smpl,
            "global_output": global_output,
            "dp_out": [],
            "dpth_out": [],
        }

        # 8. Aux heads on the finest pyramid level (whmr.py:656-662).
        if c.pymaf.aux_supv_on:
            out["dp_out"].append(self.dp_head(s_feat))
        if c.pymaf.depth_supv_on:
            out["dpth_out"].append(self.dpth_head(s_feat))

        if c.pymaf.grph_on:
            out["refined"] = out_smpl[-1]

        out["vis"] = {
            "local_smpl_vertices": smpl_output["verts"],
            "smpl_vertices": world_out.vertices,
            "pred_cam_t": smpl_output["pred_cam_t"],
            "focal_length": smpl_output["focal_length"],
            "cam_rotmat": cam_rotmat,
            "render_rotmat": render_rotmat,
            "shape": smpl_output["pred_shape"],
            "global_pose": global_pose,
            "local_pose": smpl_output["pose"],
        }
        return out

    def camcalib(
        self, full_x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """CamCalib alone: full frames -> (cam_rotmat, render_rotmat).

        The decode block of step 1 (reference whmr.py:509-524): bins ->
        detached softargmax -> euler angles; render_rotmat flips pitch
        for the overlay renderer (whmr.py:522). Exposed as an apply-able
        method so serving can run CamCalib ONCE per unique frame and feed
        crops into coalesced batches with per-crop `cam_rotmat` (the
        reference's own per-image protocol, tester.py:100-104,151-162).
        """
        (vfov_l, pitch_l, roll_l), _ = self.cam_model(full_x, train=train)
        vfov, pitch, roll = decode_cam_angles(vfov_l, pitch_l, roll_l)
        zeros = jnp.zeros_like(pitch)
        cam_rotmat = lax.stop_gradient(
            euler_to_rotmat(jnp.stack([pitch, zeros, roll], axis=-1))
        )
        render_rotmat = lax.stop_gradient(
            euler_to_rotmat(jnp.stack([-pitch, zeros, roll], axis=-1))
        )
        return cam_rotmat, render_rotmat

    def iuv_logits(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Full-frame dense-IUV part logits: backbone -> pyramid -> dp_head.

        The subgraph behind IUVProposalDetector (inference/detector.py):
        person-foreground segmentation reusing the loaded checkpoint —
        the framework's replacement for the reference's external YOLO
        detector stage (tester.py:68-79). Returns (B, Hm, Wm, 15)
        ann-index logits (channel 0 = background).
        """
        assert self.cfg.pymaf.aux_supv_on, "dp_head not built"
        s_feat = self.feature_extractor(x, train=train)
        # ALL deconv blocks, not n_iter of them: n_iter only regroups the
        # pyramid (see __call__'s bounds logic) — dp_head is trained on the
        # final full-resolution level, so stopping early at n_iter=2 would
        # feed it the half-resolution map (same channel count, no shape
        # error, silently garbage logits).
        for blk in self.deconv_blocks:
            s_feat = blk(s_feat, train=train)
        return self.dp_head(s_feat)["predict_ann_index"]

    def _graphormer_stage(
        self,
        consts: BodyConsts,
        im_feat: jnp.ndarray,
        smpl_output: Dict[str, jnp.ndarray],
        body_feat: jnp.ndarray,
        cam_state: CamState,
        meta_masks: Optional[jnp.ndarray],
        train: bool,
        j_regressor: Optional[jnp.ndarray],
    ) -> Dict[str, jnp.ndarray]:
        """One Graphormer refinement step -> smpl_out-style dict.

        Token features are MAF-sampled at the (detached) 431 coarse verts of
        the last parametric step; the refined mesh's joints and projections
        are recomputed (e2e_body_network.py:91-130), while the parametric
        fields (rotmat/cam/shape/pose) carry over (e2e:131-150).
        """
        c = self.cfg
        temp_verts = lax.stop_gradient(smpl_output["temp_verts"])
        pred_cam = lax.stop_gradient(smpl_output["pred_cam"])
        _, grid_feat = self.maf_extractors[-1](im_feat, temp_verts, pred_cam)
        refined = self.graphormer(
            body_feat, grid_feat, temp_verts, consts.adj431,
            meta_masks=meta_masks, train=train,
        )
        verts = refined["verts"]
        joints49, joints_smpl = joints_from_vertices(consts.smpl, verts)

        # Crop-frame / world projections with the carried camera, with the
        # TRAIN.STAGE detach gating of the reference (e2e:97-100, 106-124).
        kp_src = (
            joints49 if (c.train.stage == 1 or not train)
            else lax.stop_gradient(joints49)
        )
        kp_2d = weak_perspective_projection(kp_src, smpl_output["pred_cam"], c.img_res)
        kp_w_src = (
            lax.stop_gradient(joints49) if (c.train.stage == 1 and train) else joints49
        )
        img_h = cam_state.orig_shape[:, 0]
        img_w = cam_state.orig_shape[:, 1]
        camera_center = jnp.stack([img_w, img_h], axis=-1) / 2.0
        kp_2d_w = perspective_projection(
            kp_w_src, None, smpl_output["pred_cam_t"],
            smpl_output["focal_length"], camera_center,
        )
        kp_2d_w = kp_2d_w / camera_center[:, None, :] - 1.0

        if j_regressor is not None:
            kp3d = select_h36m_j14(j_regressor, verts)
        else:
            kp3d = joints49

        output = dict(smpl_output)
        output.update(
            {
                "verts": verts,
                "sub_verts": refined["sub_verts"],
                "temp_verts": refined["temp_verts"],
                "kp_2d": kp_2d,
                "kp_2d_w": kp_2d_w,
                "kp_3d": kp3d,
                "smpl_kp_3d": joints_smpl,
                "pelvis": joints_smpl[:, :1, :],
                "markers": verts[:, consts.ssm],
            }
        )
        return output
