"""Reference-faithful torch recomposition of the FULL W-HMR forward.

Re-declares the entire reference eval graph (models/whmr.py:503-678:
backbone -> deconv pyramid -> Tz head -> 3x MAF loop with grid_sample ->
residual SMPL regressors -> global-orient regressor -> world SMPL -> aux
heads) in torch, written fresh from the reference's documented semantics —
NOT copied or imported. Attribute names replicate the reference module graph
so `state_dict()` reproduces the key inventory of the published
`w-hmr-p-vitpose_checkpoint.pt` (demo/tester.py:61-66 strict load).

Used by tests/test_parity_full_graph.py as the whole-graph oracle (VERDICT
round-2 items 2 and 8) — the strongest offline proxy for the BASELINE.md
0.5 mm PA-MPJPE parity gate.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from test_parity_compose import (
    TorchBlock,
    TorchViT,
    torch_unbiased_gram_schmidt,
)
from test_smpl import numpy_lbs_reference

FOCAL_LENGTH = 1000.0  # reference core/constants.py:4
IMG_RES = (256, 256)   # (W, H), reference configs/pymaf_config.yaml:83-85


# ---------------------------------------------------------------------------
# geometry (reference utils/geometry.py semantics, re-declared)
# ---------------------------------------------------------------------------
def perspective_projection(points, rotation, translation, focal_length, camera_center):
    """geometry.py:310-341: x' = K ((R p + t) / z)."""
    if rotation is not None:
        points = torch.einsum("bij,bkj->bki", rotation, points)
    if translation is not None:
        points = points + translation.unsqueeze(1)
    projected = points / points[..., 2:3]
    f = torch.as_tensor(focal_length, dtype=points.dtype)
    if f.ndim == 0:
        f = f.expand(points.shape[0])
    return projected[..., :2] * f[:, None, None] + camera_center.unsqueeze(1)


def projection(pred_joints, pred_camera):
    """geometry.py:289-307: crop-frame weak-persp, normalized to [-1, 1]."""
    w, h = IMG_RES
    cam_t = torch.stack(
        [
            pred_camera[:, 1],
            pred_camera[:, 2],
            2 * FOCAL_LENGTH / (h * pred_camera[:, 0] + 1e-9),
        ],
        dim=-1,
    )
    b = pred_joints.shape[0]
    center = torch.zeros(b, 2, dtype=pred_joints.dtype)
    kp = perspective_projection(pred_joints, None, cam_t, FOCAL_LENGTH, center)
    return kp / (torch.tensor([w / 2.0, h / 2.0], dtype=kp.dtype))


def convert_pare_to_full_img_cam(pare_cam, bbox_height, bbox_center, img_w, img_h, tz):
    """geometry.py:139-157 (Tz form)."""
    s, tx, ty = pare_cam[:, 0], pare_cam[:, 1], pare_cam[:, 2]
    cx = 2 * (bbox_center[:, 0] - img_w / 2.0) / (s * bbox_height)
    cy = 2 * (bbox_center[:, 1] - img_h / 2.0) / (s * bbox_height)
    return torch.stack([tx + cx, ty + cy, tz], dim=-1)


def rotmat_to_rot6d(rotmat):
    """geometry.py:275-286: first two columns, INTERLEAVED row-major
    flatten of the (3, 2) slice — x[:, :, :2].reshape(B, 6), no transpose."""
    return rotmat[:, :, :2].reshape(rotmat.shape[0], 6)


# ---------------------------------------------------------------------------
# SMPL oracle: independent numpy LBS + pare 49-joint head
# ---------------------------------------------------------------------------
def smpl49(assets, betas, rotmats):
    """pare-SMPL forward: verts + 49-joint set (whmr.py:132-137 semantics).

    LBS from the independent numpy implementation (test_smpl); the joint head
    is [24 kinematic ; verts[smplh vertex ids] ; J_extra verts][JOINT_MAP].
    """
    v, j_kin = numpy_lbs_reference(
        assets, betas.detach().numpy(), rotmats.detach().numpy()
    )
    verts = torch.from_numpy(v.astype(np.float32))
    jkin = torch.from_numpy(j_kin.astype(np.float32))
    extra_vtx = verts[:, assets.vertex_joint_ids]
    joints_smpl = torch.cat([jkin, extra_vtx], dim=1)  # (B, 45, 3)
    jreg_extra = torch.from_numpy(assets.j_regressor_extra.astype(np.float32))
    extra_reg = torch.einsum("jv,bvk->bjk", jreg_extra, verts)
    j54 = torch.cat([joints_smpl, extra_reg], dim=1)
    joints49 = j54[:, assets.joint_map]
    return verts, joints49, joints_smpl


# ---------------------------------------------------------------------------
# modules (reference attribute names for state_dict parity)
# ---------------------------------------------------------------------------
class FeatureExtractor(nn.Module):
    """pose_vit.py:8-14: wraps the mmpose ViT as `.backbone`, returns NCHW."""

    def __init__(self, vit: TorchViT, grid_hw):
        super().__init__()
        self.backbone = vit
        self.grid_hw = grid_hw

    def forward(self, x):
        tokens = self.backbone(x)  # (B, N, C)
        b, n, c = tokens.shape
        hp, wp = self.grid_hw
        return tokens.transpose(1, 2).reshape(b, c, hp, wp)


class MAFExtractorOracle(nn.Module):
    """maf_extractor.py:17-143: conv1d skip-MLP + grid_sample pooling."""

    def __init__(self, mlp_dim=(256, 128, 64, 32)):
        super().__init__()
        self.filters = list(mlp_dim[1:])
        dims_in = (mlp_dim[0], mlp_dim[1] + mlp_dim[0], mlp_dim[2] + mlp_dim[0])
        for i in range(3):
            setattr(self, f"conv{i}", nn.Conv1d(dims_in[i], mlp_dim[i + 1], 1))
        self.im_feat = None
        self.cam = None

    def reduce_dim(self, feature):
        y = feature
        tmpy = feature
        for i in range(len(self.filters)):
            y = getattr(self, f"conv{i}")(y if i == 0 else torch.cat([y, tmpy], 1))
            if i != len(self.filters) - 1:
                y = F.leaky_relu(y)
        y = F.relu(y)
        # NOTE: flattens (B, C_p, N) CHANNEL-major (maf_extractor.py:100) —
        # part of the checkpoint format the flax side must reproduce.
        return y.view(y.shape[0], -1)

    def sampling(self, points, im_feat=None):
        if im_feat is None:
            im_feat = self.im_feat
        point_feat = F.grid_sample(
            im_feat, points.unsqueeze(2), align_corners=True
        )[..., 0]
        return self.reduce_dim(point_feat), point_feat

    def forward(self, p, cam=None):
        if cam is None:
            cam = self.cam
        p2d = projection(p, cam)
        return self.sampling(p2d)


class RegressorOracle(nn.Module):
    """whmr.py:42-269: residual MLP + SMPL forward + projection bundle."""

    def __init__(self, feat_dim, assets):
        super().__init__()
        npose = 216
        self.fc1 = nn.Linear(feat_dim + npose + 13 + 5, 1024)
        self.fc2 = nn.Linear(1024, 1024)
        self.decpose = nn.Linear(1024, npose)
        self.decshape = nn.Linear(1024, 10)
        self.deccam = nn.Linear(1024, 3)
        self.assets = assets
        # Mean-param + constant buffers as saved in the real checkpoint
        # (whmr.py:64-98; only iuv2smpl.smpl.* is stripped, saver.py:43-45).
        ident = np.tile(np.eye(3, dtype=np.float32).reshape(1, 9), (1, 24))
        self.register_buffer("init_pose", torch.from_numpy(ident.reshape(1, 216)))
        self.register_buffer(
            "init_shape", torch.from_numpy(assets.mean_shape.reshape(1, 10))
        )
        self.register_buffer(
            "init_cam", torch.from_numpy(assets.mean_cam.reshape(1, 3))
        )
        self.register_buffer("Dmap0", torch.from_numpy(assets.dmap0))
        self.register_buffer("Dmap1", torch.from_numpy(assets.dmap1))

    def forward(
        self, x_feat, bbox_info, Tz, orig_shape, center, scale, bbox_height,
        init_pose, init_shape, init_cam,
    ):
        """Eval-mode (is_train=False, TRAIN.STAGE=2) step, whmr.py:103-206."""
        x = torch.cat((x_feat, bbox_info), dim=1)
        b = x.shape[0]
        pred_pose = init_pose.reshape(b, -1)
        pred_shape = init_shape
        pred_cam = init_cam
        xc = torch.cat([x, pred_pose, pred_shape, pred_cam], 1)
        xc = self.fc2(self.fc1(xc))  # dropout is identity in eval
        pred_pose = self.decpose(xc) + pred_pose
        pred_shape = self.decshape(xc) + pred_shape
        pred_cam = self.deccam(xc) + pred_cam

        pred_rotmat = pred_pose.view(b, 24, 3, 3)
        pred_rotmat = torch_unbiased_gram_schmidt(pred_rotmat)  # eval GS

        verts, joints49, joints_smpl = smpl49(self.assets, pred_shape, pred_rotmat)
        kp_2d = projection(joints49, pred_cam)

        s = pred_cam[:, 0]
        focal_length = s * bbox_height * Tz / 2.0
        img_w, img_h = orig_shape[:, 1], orig_shape[:, 0]
        camera_center = torch.stack([img_w, img_h], dim=-1) / 2.0
        pred_cam_t = convert_pare_to_full_img_cam(
            pred_cam, bbox_height, center, img_w, img_h, tz=Tz
        )
        kp_2d_w = perspective_projection(
            joints49, None, pred_cam_t, focal_length, camera_center
        )
        kp_2d_w = kp_2d_w / camera_center.unsqueeze(1) - 1

        sub_verts = torch.matmul(self.Dmap0, verts)
        temp_verts = torch.matmul(self.Dmap1, sub_verts)
        markers = verts[:, self.assets.ssm]
        return {
            "verts": verts,
            "sub_verts": sub_verts,
            "temp_verts": temp_verts,
            "kp_2d": kp_2d,
            "kp_2d_w": kp_2d_w,
            "rotmat": pred_rotmat,
            "pred_cam": pred_cam,
            "pred_cam_t": pred_cam_t,
            "pred_shape": pred_shape,
            "pred_pose": pred_pose,
            "focal_length": focal_length,
            "markers": markers,
        }, x


class GlobalOrientOracle(nn.Module):
    """whmr.py:272-305: world global-orient head (eval: GS, no feedback)."""

    def __init__(self, feat_dim):
        super().__init__()
        self.fc1 = nn.Linear(feat_dim + 6 + 9, 2048)
        self.fc2 = nn.Linear(2048, 2048)
        self.decrot = nn.Linear(2048, 9)
        ident = np.eye(3, dtype=np.float32).reshape(1, 9)
        self.register_buffer("init_pose", torch.from_numpy(ident))

    def forward(self, x, cam_rotmat, local_orient):
        b = x.shape[0]
        cam6d = rotmat_to_rot6d(cam_rotmat)
        local = local_orient.reshape(b, -1)
        # whmr.py:296-303: 3 iterations, inputs never change -> one suffices
        # in eval, but run 3 to be literal.
        for _ in range(3):
            xc = torch.cat([x, cam6d, local], dim=1)
            xc = self.fc2(self.fc1(xc))
            pred_rot = self.decrot(xc) + local
        pred_rot = pred_rot.reshape(-1, 1, 3, 3)
        return torch_unbiased_gram_schmidt(pred_rot)


class IUVHeadOracle(nn.Module):
    """iuv_predictor.py:14-91."""

    def __init__(self, feat_dim, with_uv=True):
        super().__init__()
        self.with_uv = with_uv
        if with_uv:
            self.predict_u = nn.Conv2d(feat_dim, 25, 3, padding=1)
            self.predict_v = nn.Conv2d(feat_dim, 25, 3, padding=1)
        self.predict_ann_index = nn.Conv2d(feat_dim, 15, 3, padding=1)
        self.predict_uv_index = nn.Conv2d(feat_dim, 25, 3, padding=1)

    def forward(self, x):
        out = {
            "predict_uv_index": self.predict_uv_index(x),
            "predict_ann_index": self.predict_ann_index(x),
        }
        if self.with_uv:
            out["predict_u"] = self.predict_u(x)
            out["predict_v"] = self.predict_v(x)
        return out


class DepthHeadOracle(nn.Module):
    """depth_predictor.py:12-27."""

    def __init__(self, feat_dim):
        super().__init__()
        self.predict_depth = nn.Conv2d(feat_dim, 1, 3, padding=1)

    def forward(self, x):
        return self.predict_depth(x)


class TorchResNet50Skeleton(nn.Module):
    """torchvision-named resnet50 module SKELETON (cam_model.backbone).

    Structure only — used for state_dict key/shape inventory in the
    checkpoint-manifest test; forward is not implemented (the CamCalib
    forward path has its own organ-level parity tests)."""

    class Bottleneck(nn.Module):
        def __init__(self, in_c, planes, stride, downsample):
            super().__init__()
            self.conv1 = nn.Conv2d(in_c, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            if downsample:
                self.downsample = nn.Sequential(
                    nn.Conv2d(in_c, planes * 4, 1, stride=stride, bias=False),
                    nn.BatchNorm2d(planes * 4),
                )

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        in_c = 64
        for stage, (n_blocks, planes) in enumerate(
            zip((3, 4, 6, 3), (64, 128, 256, 512))
        ):
            blocks = []
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                blocks.append(self.Bottleneck(in_c, planes, stride, downsample=(b == 0)))
                in_c = planes * 4
            setattr(self, f"layer{stage + 1}", nn.Sequential(*blocks))
        self.fc = nn.Linear(2048, 1000)


class CamModelSkeleton(nn.Module):
    """cam_model.py:24-52 structure (backbone + 3 bin heads)."""

    def __init__(self):
        super().__init__()
        self.backbone = TorchResNet50Skeleton()
        self.fc_vfov = nn.Linear(2048, 256)
        self.fc_pitch = nn.Linear(2048, 256)
        self.fc_roll = nn.Linear(2048, 256)


class TorchWHMROracle(nn.Module):
    """The composed reference graph (whmr.py:313-440 init, :503-678 forward).

    Eval-mode forward with cam_rotmat given (the eval.py:177-179 protocol);
    TRAIN.STAGE=2, J_regressor=None, N_ITER=3, vitpose backbone.
    """

    def __init__(
        self,
        assets,
        embed_dim=64,
        depth=2,
        num_heads=2,
        img_size=(128, 96),
        deconv_filters=(32, 32, 32),
        mlp_dim=(32, 16, 8, 4),
        aux_on=True,
        depth_on=True,
        with_cam_model=False,
    ):
        super().__init__()
        self.assets = assets
        patch, pad = 16, 4
        hp = (img_size[0] + 2 * pad - patch) // patch + 1
        wp = (img_size[1] + 2 * pad - patch) // patch + 1
        self.feature_extractor = FeatureExtractor(
            TorchViT(embed_dim, depth, num_heads, hp * wp), (hp, wp)
        )

        # deconv pyramid (whmr.py:459-501: ConvT k4 s2 p1 + BN + ReLU, x3)
        layers = []
        in_c = embed_dim
        for f in deconv_filters:
            layers += [
                nn.ConvTranspose2d(in_c, f, 4, stride=2, padding=1, bias=False),
                nn.BatchNorm2d(f),
                nn.ReLU(inplace=True),
            ]
            in_c = f
        self.deconv_layers = nn.Sequential(*layers)

        self.maf_extractor = nn.ModuleList(
            [MAFExtractorOracle(mlp_dim) for _ in range(3)]
        )

        # fixed grid (whmr.py:338-347, vitpose: 7x9)
        gw, gh = 7, 9
        xv, yv = torch.meshgrid(
            torch.linspace(-1, 1, gw), torch.linspace(-1, 1, gh), indexing="ij"
        )
        self.register_buffer(
            "points_grid", torch.stack([xv.reshape(-1), yv.reshape(-1)]).unsqueeze(0)
        )

        grid_feat_len = gw * gh * mlp_dim[-1]
        ma_feat_len = 67 * mlp_dim[-1]
        self.regressor = nn.ModuleList(
            [
                RegressorOracle(
                    grid_feat_len if i == 0 else ma_feat_len, assets
                )
                for i in range(3)
            ]
        )

        # Tz head (whmr.py:417-430, vitpose): final pyramid level is
        # (hp*8, wp*8) after three x2 deconvs.
        hf, wf = hp * 8, wp * 8
        h1, w1 = (hf - 7) // 3 + 1, (wf - 7) // 3 + 1
        tok = ((h1 - 7) // 2 + 1) * ((w1 - 7) // 2 + 1)
        self.tz_tok = tok
        self.conv = nn.Sequential(
            nn.Conv2d(deconv_filters[-1], 64, 7, stride=3, padding=0, bias=False),
            nn.Conv2d(64, 5, 7, stride=2, padding=0, bias=False),
        )
        self.transformer_decoder = TorchBlock(tok, num_heads=2, qkv_bias=False, eps=1e-5)
        self.est_Tz = nn.Sequential(
            nn.Linear(tok, 12), nn.Linear(12, 1), nn.BatchNorm1d(1), nn.Sigmoid()
        )

        self.global_orient = GlobalOrientOracle(ma_feat_len + 5)
        if aux_on:
            self.dp_head = IUVHeadOracle(deconv_filters[-1])
        if depth_on:
            self.dpth_head = DepthHeadOracle(deconv_filters[-1])
        if with_cam_model:
            self.cam_model = CamModelSkeleton()

    def forward_init(self, batch_size):
        """whmr.py:211-269 (mean-parameter init; no learned weights)."""
        r0 = self.regressor[0]
        pred_pose = r0.init_pose.expand(batch_size, -1)
        pred_shape = r0.init_shape.expand(batch_size, -1)
        pred_cam = r0.init_cam.expand(batch_size, -1)
        pred_rotmat = pred_pose.view(batch_size, 24, 3, 3)
        verts, joints49, joints_smpl = smpl49(self.assets, pred_shape, pred_rotmat)
        markers = verts[:, self.assets.ssm]
        return {
            "verts": verts,
            "rotmat": pred_rotmat,
            "pred_cam": pred_cam,
            "pred_shape": pred_shape,
            "markers": markers,
            "kp_2d": projection(joints49, pred_cam),
        }

    def forward(self, x, center, scale, bbox_height, orig_shape, bbox_info, cam_rotmat):
        batch_size = x.shape[0]
        s_feat = self.feature_extractor(x)

        deconv_blocks = [
            self.deconv_layers[0:3], self.deconv_layers[3:6], self.deconv_layers[6:9]
        ]

        smpl_output = self.forward_init(batch_size)
        out_smpl = [smpl_output]

        for rf_i in range(3):
            s_feat = deconv_blocks[rf_i](s_feat)
            self.maf_extractor[rf_i].im_feat = s_feat

        # Tz (whmr.py:566-577)
        s_mini = self.conv(s_feat).reshape(batch_size, 5, -1)
        s_dec = self.transformer_decoder(s_mini).transpose(1, 2)  # (B, tok, 5)
        s_short = s_dec.mean(dim=-1)  # AvgPool1d(kernel=5)
        tz = 10.0 * self.est_Tz(s_short).squeeze(-1)

        body_feat = None
        for rf_i in range(3):
            pred_cam = smpl_output["pred_cam"].detach()
            pred_shape = smpl_output["pred_shape"].detach()
            pred_pose = smpl_output["rotmat"].detach()
            markers = smpl_output["markers"].detach()
            self.maf_extractor[rf_i].cam = pred_cam

            if rf_i == 0:
                pts = torch.transpose(
                    self.points_grid.expand(batch_size, -1, -1), 1, 2
                )
                ref_feature, _ = self.maf_extractor[rf_i].sampling(pts)
            else:
                ref_feature, _ = self.maf_extractor[rf_i](markers)
            smpl_output, feat_cat = self.regressor[rf_i](
                ref_feature, bbox_info, tz, orig_shape, center, scale,
                bbox_height, pred_pose, pred_shape, pred_cam,
            )
            if rf_i > 0:
                body_feat = feat_cat
            out_smpl.append(smpl_output)

        # global orient -> world SMPL (whmr.py:630-654)
        last_local = smpl_output["rotmat"][:, 0]
        global_rotmat1 = self.global_orient(body_feat, cam_rotmat, last_local)
        global_full = torch.cat([global_rotmat1, smpl_output["rotmat"][:, 1:]], dim=1)
        global_verts, global_joints49, _ = smpl49(
            self.assets, smpl_output["pred_shape"], global_full
        )

        out = {
            "smpl_out": out_smpl,
            "global_verts": global_verts,
            "global_rotmat": global_full,
            "global_kp_3d": global_joints49,
        }
        if hasattr(self, "dp_head"):
            out["dp_out"] = self.dp_head(s_feat)
        if hasattr(self, "dpth_head"):
            out["dpth_out"] = self.dpth_head(s_feat)
        return out
