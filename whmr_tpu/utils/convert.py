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


# state_dict keys that are CONSTANTS in this framework's design (they ride
# the BodyConsts pytree or are baked in), not parameters to convert:
KNOWN_BUFFER_PATTERNS = (
    r"\.smpl\.",                    # per-Regressor SMPL buffers (whmr.py:59)
    r"\.vertex_joint_selector\.",   # smplx VertexJointSelector buffer
    r"\.init_(pose|shape|cam)$",    # mean-param buffers (whmr.py:68-70,287)
    r"(^|\.)points_grid$",          # fixed sample grid (whmr.py:347)
    r"\.Dmap[01]?$",                # mesh-downsampling buffers (whmr.py:97-98)
    r"num_batches_tracked$",        # torch BN step counters
    r"^cam_model\.backbone\.fc\.",  # ImageNet classifier head, unused
)

# The ViT keys appear under different prefixes depending on what is being
# converted: the full WHMR checkpoint wraps the mmpose ViT as
# `feature_extractor.backbone.*` (pose_vit.py:11), while the standalone
# `vitpose-b-multi-coco.pth` uses `backbone.*`.
_VIT_PREFIXES = (
    "feature_extractor.backbone.",
    "feature_extractor.",
    "backbone.",
    "",
)


def is_known_buffer(key: str) -> bool:
    return any(re.search(p, key) for p in KNOWN_BUFFER_PATTERNS)


def convert_whmr_checkpoint(
    state_dict: Dict[str, Any], return_report: bool = False
):
    """Reference WHMR state_dict -> {'params': ..., 'batch_stats': ...}.

    Handles the vitpose-backbone configuration (the published model). Keys
    not part of the model graph (SMPL buffers, Dmaps, points_grid — stripped
    or constant in our design) are skipped; with return_report=True also
    returns {'consumed', 'skipped_buffers', 'unrecognized'} key sets so
    callers can assert nothing real was dropped.
    """
    params: Dict = {}
    stats: Dict = {}
    consumed = set()

    def np_(key):
        consumed.add(key)
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

    # --- ViT backbone (vendored vit.py names; prefix per checkpoint kind) --
    vit_prefix = next(
        (p for p in _VIT_PREFIXES if p + "patch_embed.proj.weight" in keys), None
    )
    if vit_prefix is not None:
        conv(("feature_extractor", "patch_embed"), vit_prefix + "patch_embed.proj")
        _set(params, ("feature_extractor", "pos_embed"), np_(vit_prefix + "pos_embed"))
        pat = re.escape(vit_prefix) + r"blocks\.(\d+)\."
        n_blocks = max(
            int(m.group(1)) + 1 for k in keys if (m := re.match(pat, k))
        )
        for i in range(n_blocks):
            src = f"{vit_prefix}blocks.{i}"
            dst = ("feature_extractor", f"block{i}")
            ln(dst + ("norm1",), src + ".norm1")
            ln(dst + ("norm2",), src + ".norm2")
            linear(dst + ("attn", "qkv"), src + ".attn.qkv")
            linear(dst + ("attn", "proj"), src + ".attn.proj")
            linear(dst + ("mlp", "Dense_0"), src + ".mlp.fc1")
            linear(dst + ("mlp", "Dense_1"), src + ".mlp.fc2")
        ln(("feature_extractor", "last_norm"), vit_prefix + "last_norm")

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

    out = {"params": params, "batch_stats": stats}
    if return_report:
        rest = set(keys) - consumed
        skipped = {k for k in rest if is_known_buffer(k)}
        report = {
            "consumed": consumed,
            "skipped_buffers": skipped,
            "unrecognized": rest - skipped,
        }
        return out, report
    return out


def tree_paths(tree: Dict, prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Tuple[int, ...]]:
    """Flatten a nested param tree to {path: shape}."""
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict) or hasattr(v, "items"):
            out.update(tree_paths(dict(v), prefix + (k,)))
        else:
            out.update({prefix + (k,): tuple(np.shape(v))})
    return out


def check_against_model(converted: Dict[str, Dict], variables: Dict[str, Dict]):
    """Compare a converted tree against a live `model.init` tree.

    Returns (missing, unexpected, mismatched): paths the conversion failed
    to produce, paths it produced that the model doesn't have, and paths
    whose shapes disagree. All three empty <=> the conversion is complete
    (the flax analogue of the reference's strict=True load,
    demo/tester.py:61-66).
    """
    missing, unexpected, mismatched = [], [], []
    for coll in ("params", "batch_stats"):
        want = tree_paths(dict(variables.get(coll, {})))
        got = tree_paths(dict(converted.get(coll, {})))
        missing += [(coll,) + p for p in want.keys() - got.keys()]
        unexpected += [(coll,) + p for p in got.keys() - want.keys()]
        mismatched += [
            (coll,) + p
            for p in want.keys() & got.keys()
            if want[p] != got[p]
        ]
    return missing, unexpected, mismatched


def synthetic_reference_state_dict(cfg, seed: int = 0) -> Dict[str, np.ndarray]:
    """A full reference-shaped WHMR state_dict (vitpose config) from cfg.

    Every key family of the published `w-hmr-p-vitpose_checkpoint.pt`
    (module graph per reference whmr.py:313-440 attribute names) with
    shapes derived from `cfg`, including representative constant buffers
    that the saver keeps (smpl buffers, Dmaps, points_grid, init params) so
    conversion-completeness tests exercise the skip logic.
    """
    rng = np.random.RandomState(seed)
    sd: Dict[str, np.ndarray] = {}

    def add(key, *shape):
        sd[key] = (rng.randn(*shape) * 0.05).astype(np.float32)

    # ViT (pose_vit.py:11 wraps mmpose ViT as .backbone)
    e = cfg.vit.embed_dim
    hp, wp = cfg.vit.grid_hw
    p = cfg.vit.patch_size
    vp = "feature_extractor.backbone."
    add(vp + "patch_embed.proj.weight", e, 3, p, p)
    add(vp + "patch_embed.proj.bias", e)
    add(vp + "pos_embed", 1, hp * wp + 1, e)
    hid = int(e * cfg.vit.mlp_ratio)
    for i in range(cfg.vit.depth):
        b = f"{vp}blocks.{i}."
        for nrm in ("norm1", "norm2"):
            add(b + nrm + ".weight", e)
            add(b + nrm + ".bias", e)
        add(b + "attn.qkv.weight", 3 * e, e)
        add(b + "attn.qkv.bias", 3 * e)
        add(b + "attn.proj.weight", e, e)
        add(b + "attn.proj.bias", e)
        add(b + "mlp.fc1.weight", hid, e)
        add(b + "mlp.fc1.bias", hid)
        add(b + "mlp.fc2.weight", e, hid)
        add(b + "mlp.fc2.bias", e)
    add(vp + "last_norm.weight", e)
    add(vp + "last_norm.bias", e)

    # deconv pyramid (whmr.py:459-501: Sequential ConvT/BN/ReLU x3)
    fs = cfg.deconv.num_filters
    ins = (e, fs[0], fs[1])
    for i, base in enumerate((0, 3, 6)):
        k = cfg.deconv.num_kernels[i]
        add(f"deconv_layers.{base}.weight", ins[i], fs[i], k, k)
        bnp = f"deconv_layers.{base + 1}."
        add(bnp + "weight", fs[i])
        add(bnp + "bias", fs[i])
        add(bnp + "running_mean", fs[i])
        sd[bnp + "running_var"] = np.abs(rng.randn(fs[i])).astype(np.float32) + 1.0
        sd[bnp + "num_batches_tracked"] = np.zeros((), np.int64)

    # MAF extractors (maf_extractor.py:33-46 conv0..2 + Dmap buffer)
    m = cfg.pymaf.mlp_dim
    for i in range(cfg.pymaf.n_iter):
        pre = f"maf_extractor.{i}."
        dims_in = (m[0], m[1] + m[0], m[2] + m[0])
        for l in range(3):
            add(pre + f"conv{l}.weight", m[l + 1], dims_in[l], 1)
            add(pre + f"conv{l}.bias", m[l + 1])
        add(pre + "Dmap", 431, 6890)

    # regressors (whmr.py:42-70)
    gw, gh = cfg.points_grid_wh
    for i in range(3):
        feat = gw * gh * m[-1] if i == 0 else cfg.pymaf.n_markers * m[-1]
        pre = f"regressor.{i}."
        add(pre + "fc1.weight", 1024, feat + 216 + 13 + 5)
        add(pre + "fc1.bias", 1024)
        add(pre + "fc2.weight", 1024, 1024)
        add(pre + "fc2.bias", 1024)
        for name, d in (("decpose", 216), ("decshape", 10), ("deccam", 3)):
            add(pre + name + ".weight", d, 1024)
            add(pre + name + ".bias", d)
        add(pre + "init_pose", 1, 216)
        add(pre + "init_shape", 1, 10)
        add(pre + "init_cam", 1, 3)
        add(pre + "smpl.v_template", 16, 3)  # representative stripped buffer
        add(pre + "vertex_joint_selector.extra_joints_idxs", 21)

    # Tz head (whmr.py:417-430): conv stack + timm Block + est_Tz
    hf, wf = hp * 8, wp * 8  # finest pyramid level (3 x2 deconvs)
    s1 = 3 if cfg.pymaf.backbone == "vitpose" else 2
    h1, w1 = (hf - 7) // s1 + 1, (wf - 7) // s1 + 1
    tok = ((h1 - 7) // 2 + 1) * ((w1 - 7) // 2 + 1)
    add("conv.0.weight", 64, fs[-1], 7, 7)
    add("conv.1.weight", 5, 64, 7, 7)
    for nrm in ("norm1", "norm2"):
        add(f"transformer_decoder.{nrm}.weight", tok)
        add(f"transformer_decoder.{nrm}.bias", tok)
    add("transformer_decoder.attn.qkv.weight", 3 * tok, tok)  # qkv_bias=False
    add("transformer_decoder.attn.proj.weight", tok, tok)
    add("transformer_decoder.attn.proj.bias", tok)
    add("transformer_decoder.mlp.fc1.weight", 4 * tok, tok)
    add("transformer_decoder.mlp.fc1.bias", 4 * tok)
    add("transformer_decoder.mlp.fc2.weight", tok, 4 * tok)
    add("transformer_decoder.mlp.fc2.bias", tok)
    tz_hidden = 12 if cfg.pymaf.backbone == "vitpose" else 10
    add("est_Tz.0.weight", tz_hidden, tok)
    add("est_Tz.0.bias", tz_hidden)
    add("est_Tz.1.weight", 1, tz_hidden)
    add("est_Tz.1.bias", 1)
    add("est_Tz.2.weight", 1)
    add("est_Tz.2.bias", 1)
    add("est_Tz.2.running_mean", 1)
    sd["est_Tz.2.running_var"] = np.ones(1, np.float32)
    sd["est_Tz.2.num_batches_tracked"] = np.zeros((), np.int64)

    # global orient (whmr.py:272-287)
    go_in = cfg.pymaf.n_markers * m[-1] + 5 + 6 + 9
    add("global_orient.fc1.weight", 2048, go_in)
    add("global_orient.fc1.bias", 2048)
    add("global_orient.fc2.weight", 2048, 2048)
    add("global_orient.fc2.bias", 2048)
    add("global_orient.decrot.weight", 9, 2048)
    add("global_orient.decrot.bias", 9)
    add("global_orient.init_pose", 1, 9)

    sd["points_grid"] = np.zeros((1, 2, gw * gh), np.float32)

    # aux heads (iuv_predictor.py:20-50, depth_predictor.py:16)
    if cfg.pymaf.aux_supv_on:
        chans = {"predict_u": 25, "predict_v": 25,
                 "predict_uv_index": 25, "predict_ann_index": 15}
        for name, ch in chans.items():
            add(f"dp_head.{name}.weight", ch, fs[-1], 3, 3)
            add(f"dp_head.{name}.bias", ch)
    if cfg.pymaf.depth_supv_on:
        add("dpth_head.predict_depth.weight", 1, fs[-1], 3, 3)
        add("dpth_head.predict_depth.bias", 1)

    # CamCalib: torchvision-style resnet50 under cam_model.backbone
    # (cam_model.py:33 via pare) + three 256-bin fc heads (:40-52)
    cb = "cam_model.backbone."

    def conv_bn(cpre, bpre, out_c, in_c, k):
        add(cpre + ".weight", out_c, in_c, k, k)
        add(bpre + ".weight", out_c)
        add(bpre + ".bias", out_c)
        add(bpre + ".running_mean", out_c)
        sd[bpre + ".running_var"] = np.ones(out_c, np.float32)
        sd[bpre + ".num_batches_tracked"] = np.zeros((), np.int64)

    conv_bn(cb + "conv1", cb + "bn1", 64, 3, 7)
    in_c = 64
    for stage, (n_blocks, planes) in enumerate(zip((3, 4, 6, 3), (64, 128, 256, 512))):
        for blk in range(n_blocks):
            pre = f"{cb}layer{stage + 1}.{blk}."
            conv_bn(pre + "conv1", pre + "bn1", planes, in_c, 1)
            conv_bn(pre + "conv2", pre + "bn2", planes, planes, 3)
            conv_bn(pre + "conv3", pre + "bn3", planes * 4, planes, 1)
            if blk == 0:
                conv_bn(pre + "downsample.0", pre + "downsample.1", planes * 4, in_c, 1)
            in_c = planes * 4
    add(cb + "fc.weight", 1000, 2048)
    add(cb + "fc.bias", 1000)
    for angle in ("vfov", "pitch", "roll"):
        add(f"cam_model.fc_{angle}.weight", 256, 2048)
        add(f"cam_model.fc_{angle}.bias", 256)
    return sd


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
