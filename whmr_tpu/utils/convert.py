"""PyTorch -> flax parameter conversion for reference W-HMR checkpoints.

The published reference checkpoints (`w-hmr-p-vitpose_checkpoint.pt` loaded
strict=True at demo/tester.py:61-66, `camcalib_sa_biased_l2.ckpt` at
whmr.py:437-438, `vitpose-b-multi-coco.pth` at pose_vit.py:21) store torch
state_dicts. This module maps them onto the whmr_tpu parameter tree.

Layout conventions (validated by tests/test_convert.py against live torch):
- Linear:           torch (out, in)        -> flax kernel (in, out)
- Conv2d:           torch (O, I, kH, kW)   -> flax (kH, kW, I, O)
- ConvTranspose2d:  torch (I, O, kH, kW)   -> flax ConvTranspose kernel
                    (kH, kW, I, O) with spatially FLIPPED taps (flax's
                    conv_transpose does not mirror the kernel; torch's is
                    the gradient of conv, which does)
- BatchNorm:        weight/bias -> scale/bias; running stats -> batch_stats
- Conv1d k=1 (MAF): torch (O, I, 1)        -> Dense kernel (I, O)
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def t_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def t_conv2d(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def t_convtranspose2d(w: np.ndarray) -> np.ndarray:
    # torch (I, O, kH, kW) -> flax (kH, kW, I, O), spatial flip.
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def t_conv1d_pointwise(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w[:, :, 0].T)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def convert_whmr_checkpoint(state_dict: Dict[str, Any]) -> Dict[str, Dict]:
    """Reference WHMR state_dict -> {'params': ..., 'batch_stats': ...}.

    Handles the vitpose-backbone configuration (the published model). Keys
    not part of the model graph (SMPL buffers, Dmaps, points_grid — stripped
    or constant in our design) are skipped.
    """
    params: Dict = {}
    stats: Dict = {}

    def np_(key):
        v = state_dict[key]
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    def linear(dst, src):
        _set(params, dst + ("kernel",), t_linear(np_(src + ".weight")))
        if src + ".bias" in state_dict:
            _set(params, dst + ("bias",), np_(src + ".bias"))

    def conv(dst, src, bias=True):
        _set(params, dst + ("kernel",), t_conv2d(np_(src + ".weight")))
        if bias and src + ".bias" in state_dict:
            _set(params, dst + ("bias",), np_(src + ".bias"))

    def convt(dst, src):
        _set(params, dst + ("kernel",), t_convtranspose2d(np_(src + ".weight")))
        if src + ".bias" in state_dict:
            _set(params, dst + ("bias",), np_(src + ".bias"))

    def bn(dst, src):
        _set(params, dst + ("scale",), np_(src + ".weight"))
        _set(params, dst + ("bias",), np_(src + ".bias"))
        _set(stats, dst + ("mean",), np_(src + ".running_mean"))
        _set(stats, dst + ("var",), np_(src + ".running_var"))

    def ln(dst, src):
        _set(params, dst + ("scale",), np_(src + ".weight"))
        _set(params, dst + ("bias",), np_(src + ".bias"))

    keys = list(state_dict.keys())

    # --- ViT backbone (vendored vit.py names) ------------------------------
    if "feature_extractor.patch_embed.proj.weight" in keys:
        conv(("feature_extractor", "patch_embed"), "feature_extractor.patch_embed.proj")
        _set(params, ("feature_extractor", "pos_embed"), np_("feature_extractor.pos_embed"))
        n_blocks = max(
            int(m.group(1)) + 1
            for k in keys
            if (m := re.match(r"feature_extractor\.blocks\.(\d+)\.", k))
        )
        for i in range(n_blocks):
            src = f"feature_extractor.blocks.{i}"
            dst = ("feature_extractor", f"block{i}")
            ln(dst + ("norm1",), src + ".norm1")
            ln(dst + ("norm2",), src + ".norm2")
            linear(dst + ("attn", "qkv"), src + ".attn.qkv")
            linear(dst + ("attn", "proj"), src + ".attn.proj")
            linear(dst + ("mlp", "Dense_0"), src + ".mlp.fc1")
            linear(dst + ("mlp", "Dense_1"), src + ".mlp.fc2")
        ln(("feature_extractor", "last_norm"), "feature_extractor.last_norm")

    # --- deconv pyramid (whmr.py:459-501; Sequential indices 0,3,6 = ConvT,
    # 1,4,7 = BN) ------------------------------------------------------------
    for i, base in enumerate((0, 3, 6)):
        if f"deconv_layers.{base}.weight" in keys:
            convt((f"deconv{i}", "ConvTranspose_0"), f"deconv_layers.{base}")
            bn((f"deconv{i}", "BatchNorm_0"), f"deconv_layers.{base + 1}")

    # --- MAF extractors (Conv1d k=1 stacks) --------------------------------
    for i in range(3):
        for l in range(3):
            src = f"maf_extractor.{i}.conv{l}"
            if src + ".weight" in keys:
                _set(params, (f"maf{i}", f"conv{l}", "kernel"), t_conv1d_pointwise(np_(src + ".weight")))
                _set(params, (f"maf{i}", f"conv{l}", "bias"), np_(src + ".bias"))

    # --- regressors ---------------------------------------------------------
    for i in range(3):
        for name in ("fc1", "fc2", "decpose", "decshape", "deccam"):
            src = f"regressor.{i}.{name}"
            if src + ".weight" in keys:
                linear((f"regressor{i}", name), src)

    # --- Tz head ------------------------------------------------------------
    if "conv.0.weight" in keys:
        conv(("tz_head", "conv1"), "conv.0", bias=False)
        conv(("tz_head", "conv2"), "conv.1", bias=False)
        ln(("tz_head", "decoder", "norm1"), "transformer_decoder.norm1")
        ln(("tz_head", "decoder", "norm2"), "transformer_decoder.norm2")
        linear(("tz_head", "decoder", "attn", "qkv"), "transformer_decoder.attn.qkv")
        linear(("tz_head", "decoder", "attn", "proj"), "transformer_decoder.attn.proj")
        linear(("tz_head", "decoder", "mlp", "Dense_0"), "transformer_decoder.mlp.fc1")
        linear(("tz_head", "decoder", "mlp", "Dense_1"), "transformer_decoder.mlp.fc2")
        linear(("tz_head", "fc1"), "est_Tz.0")
        linear(("tz_head", "fc2"), "est_Tz.1")
        bn(("tz_head", "bn"), "est_Tz.2")

    # --- global orient ------------------------------------------------------
    for name in ("fc1", "fc2", "decrot"):
        src = f"global_orient.{name}"
        if src + ".weight" in keys:
            linear(("global_orient", name), src)

    # --- IUV / depth heads --------------------------------------------------
    for head in ("predict_u", "predict_v", "predict_uv_index", "predict_ann_index"):
        src = f"dp_head.{head}"
        if src + ".weight" in keys:
            conv(("dp_head", head), src)
    if "dpth_head.predict_depth.weight" in keys:
        conv(("dpth_head", "predict_depth"), "dpth_head.predict_depth")

    # --- CamCalib (torchvision resnet50 names under cam_model.backbone) ----
    if "cam_model.backbone.conv1.weight" in keys:
        _convert_resnet50(
            params, stats, state_dict, np_,
            src_prefix="cam_model.backbone", dst_prefix=("cam_model", "trunk"),
        )
        for angle in ("vfov", "pitch", "roll"):
            linear(("cam_model", f"fc_{angle}"), f"cam_model.fc_{angle}")

    return {"params": params, "batch_stats": stats}


def _convert_resnet50(params, stats, state_dict, np_, src_prefix: str, dst_prefix: Tuple[str, ...]):
    """torchvision resnet50 names -> layers.ResNetTrunk module tree.

    Trunk module order (models/layers.py ResNetTrunk): ConvBN_0 is the stem;
    Bottleneck_i are the 16 blocks in stage order. Flax auto-names their
    inner ConvBN_0..2 (+_3 for downsample).
    """

    def conv_bn(dst, conv_src, bn_src):
        _set(params, dst + ("Conv_0", "kernel"), _t2(np_(conv_src + ".weight")))
        _set(params, dst + ("BatchNorm_0", "scale"), np_(bn_src + ".weight"))
        _set(params, dst + ("BatchNorm_0", "bias"), np_(bn_src + ".bias"))
        _set(stats, dst + ("BatchNorm_0", "mean"), np_(bn_src + ".running_mean"))
        _set(stats, dst + ("BatchNorm_0", "var"), np_(bn_src + ".running_var"))

    def _t2(w):
        return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))

    conv_bn(dst_prefix + ("ConvBN_0",), f"{src_prefix}.conv1", f"{src_prefix}.bn1")
    layers = (3, 4, 6, 3)
    block_i = 0
    for stage, n_blocks in enumerate(layers):
        for b in range(n_blocks):
            src = f"{src_prefix}.layer{stage + 1}.{b}"
            dst = dst_prefix + (f"Bottleneck_{block_i}",)
            conv_bn(dst + ("ConvBN_0",), src + ".conv1", src + ".bn1")
            conv_bn(dst + ("ConvBN_1",), src + ".conv2", src + ".bn2")
            conv_bn(dst + ("ConvBN_2",), src + ".conv3", src + ".bn3")
            if f"{src}.downsample.0.weight" in state_dict:
                conv_bn(dst + ("ConvBN_3",), src + ".downsample.0", src + ".downsample.1")
            block_i += 1
