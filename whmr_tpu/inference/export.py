"""AOT serving export: freeze the jitted WHMR forward into a portable
StableHLO artifact (`jax.export`) plus a flat weights bundle.

Net-new vs the reference, whose only deployment story is loading the
full torch codebase and checkpoint into a live process
(demo/tester.py:55-66). An exported bundle:

- pins the EXACT traced graph (no Python model code, flax, or whmr_tpu
  needed at serving time — just `jax` + `numpy`),
- is lowered for multiple platforms at once (default cpu+tpu), so the
  same artifact serves on a TPU host and runs in CPU CI,
- carries its own weights (`weights.npz`) and input signature
  (`meta.json`), and is restored with `load_exported(dir)`.

Layout of an export directory:
    forward.jaxexport   serialized jax.export.Exported bytes
    weights.npz         flattened (variables, consts) leaves, key = index;
                        bf16 leaves stored as fp32 (npz has no bf16) and
                        cast back on load per meta dtype strings
    meta.json           input signature, dtypes, output keys, versions
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whmr_tpu.config import IMG_NORM_MEAN, IMG_NORM_STD, WHMRConfig

EXPORT_GRAPH = "forward.jaxexport"
EXPORT_CAM_GRAPH = "camcalib.jaxexport"
EXPORT_WEIGHTS = "weights.npz"
EXPORT_META = "meta.json"


def _cam_mode(camcalib) -> Optional[str]:
    """Normalize the camcalib option: False/None -> None (no calibration
    branch), True/"batch" -> the full frame rides the main graph (batch-
    global, cannot coalesce across frames), "split" -> a SECOND exported
    graph runs CamCalib per frame and the main graph takes per-crop
    `cam_rotmat` — the frozen-artifact form of the live coalesced-serving
    protocol (serve_cli.BatchingExecutor / tester.py:100-104)."""
    if camcalib in (False, None):
        return None
    if camcalib is True:
        return "batch"
    if camcalib in ("batch", "split"):
        return camcalib
    raise ValueError(f"camcalib must be False, 'batch', or 'split', "
                     f"got {camcalib!r}")

# The demo/serving output surface (mirrors pipeline.WHMRPipeline._fwd).
OUTPUT_KEYS = (
    "verts", "verts_world", "pred_cam_t", "focal_length", "cam_rotmat",
    "render_rotmat", "shape", "global_pose", "local_pose",
)

# The eval-variant output surface: exactly what the metric protocol
# consumes (inference/evaluate.py make_eval_step — world verts for
# MPJPE/PA/PVE, final-stage pose/shape/cam for the --result_file dump;
# reference eval.py:155-228, 312-319).
EVAL_OUTPUT_KEYS = ("verts_world", "verts", "pose", "shape", "camera")


def make_serving_fn(cfg: WHMRConfig, model, treedef, camcalib: bool):
    """Serving graph: uint8 images in (4x fewer transfer bytes than fp32,
    normalize on device — same trade as pipeline.py), demo vis dict out.

    flat: flattened (variables, consts) leaves, weights as ARGUMENTS so the
    artifact is weight-agnostic (and the traced graph stays small — the
    axon remote-compile 413 lesson generalizes to serialized artifacts).
    """

    mode = _cam_mode(camcalib)

    def serve(flat, x_u8, center, scale, bbox_height, orig_shape, bbox_info,
              *rest):
        variables, consts = jax.tree.unflatten(treedef, flat)
        mean = jnp.asarray(IMG_NORM_MEAN, jnp.float32)
        std = jnp.asarray(IMG_NORM_STD, jnp.float32)
        x = (x_u8.astype(jnp.float32) / 255.0 - mean) / std
        full_x = None
        cam_rotmat = None
        if mode == "batch":
            full_x = (rest[0].astype(jnp.float32) / 255.0 - mean) / std
        elif mode == "split":
            # per-crop rotation from the separate camcalib graph
            cam_rotmat = rest[0]
        out = model.apply(
            variables, consts, x, center, scale, bbox_height, orig_shape,
            bbox_info, train=False, full_x=full_x, cam_rotmat=cam_rotmat,
        )
        vis = out["vis"]
        return {
            "verts": vis["local_smpl_vertices"],
            "verts_world": vis["smpl_vertices"],
            "pred_cam_t": vis["pred_cam_t"],
            "focal_length": vis["focal_length"],
            "cam_rotmat": vis["cam_rotmat"],
            "render_rotmat": vis["render_rotmat"],
            "shape": vis["shape"],
            "global_pose": vis["global_pose"],
            "local_pose": vis["local_pose"],
        }

    return serve


def make_eval_serving_fn(cfg: WHMRConfig, model, treedef):
    """Eval-variant serving graph: the benchmark-protocol forward.

    Differs from the demo graph in exactly the ways the reference's eval
    protocol differs from its demo (eval.py:155-228 vs tester.py:100-104):
    the GT camera rotation is an INPUT (no CamCalib branch), images arrive
    already normalized fp32 (the eval loader's output), and the outputs
    are the metric-protocol quantities (EVAL_OUTPUT_KEYS) instead of the
    visualization dict. Lets `whmr-eval --bundle` score the exact frozen
    artifact that will be deployed."""

    def serve(flat, img, center, scale, bbox_height, orig_shape, bbox_info,
              cam_rotmat):
        variables, consts = jax.tree.unflatten(treedef, flat)
        preds = model.apply(
            variables, consts, img, center, scale, bbox_height, orig_shape,
            bbox_info, train=False, cam_rotmat=cam_rotmat,
        )
        last = preds["smpl_out"][-1]
        return {
            "verts_world": preds["global_output"]["global_verts"],
            "verts": last["verts"],
            "pose": last["pose"],
            "shape": last["pred_shape"],
            "camera": last["pred_cam"],
        }

    return serve


def eval_arg_structs(
    cfg: WHMRConfig, batch_size: Optional[int]
) -> Tuple[jax.ShapeDtypeStruct, ...]:
    """ShapeDtypeStructs of the eval-variant batch arguments (after the
    flat weights): normalized fp32 crops + the GT camera rotation."""
    if not batch_size:
        (batch_size,) = jax.export.symbolic_shape("B")
    h, w = cfg.crop_hw
    f32 = jnp.float32
    return (
        jax.ShapeDtypeStruct((batch_size, h, w, 3), f32),   # img (normalized)
        jax.ShapeDtypeStruct((batch_size, 2), f32),         # center
        jax.ShapeDtypeStruct((batch_size,), f32),           # scale
        jax.ShapeDtypeStruct((batch_size,), f32),           # bbox_height
        jax.ShapeDtypeStruct((batch_size, 2), f32),         # orig_shape
        jax.ShapeDtypeStruct((batch_size, 5), f32),         # bbox_info
        jax.ShapeDtypeStruct((batch_size, 3, 3), f32),      # cam_rotmat (GT)
    )


def batch_arg_structs(
    cfg: WHMRConfig, batch_size: Optional[int], camcalib: bool
) -> Tuple[jax.ShapeDtypeStruct, ...]:
    """ShapeDtypeStructs of the serving batch arguments (after the flat
    weights), matching prepare_crop_batch's host-side layout.

    batch_size None/0 -> batch-POLYMORPHIC artifact (jax.export symbolic
    dim): one bundle serves any batch size, compiled per concrete shape at
    first use. With camcalib="batch" the symbolic batch is constrained to
    B >= 2 so the (1, H, W, 3) full-frame broadcast (whmr.py:194-199)
    stays decidable under shape polymorphism; "split" needs no constraint
    (the rotation is already per-crop)."""
    mode = _cam_mode(camcalib)
    if not batch_size:
        scope = jax.export.SymbolicScope(("B >= 2",) if mode == "batch" else ())
        (batch_size,) = jax.export.symbolic_shape("B", scope=scope)
    h, w = cfg.crop_hw
    f32 = jnp.float32
    args = [
        jax.ShapeDtypeStruct((batch_size, h, w, 3), jnp.uint8),   # x_u8
        jax.ShapeDtypeStruct((batch_size, 2), f32),               # center
        jax.ShapeDtypeStruct((batch_size,), f32),                 # scale
        jax.ShapeDtypeStruct((batch_size,), f32),                 # bbox_height
        jax.ShapeDtypeStruct((batch_size, 2), f32),               # orig_shape
        jax.ShapeDtypeStruct((batch_size, 5), f32),               # bbox_info
    ]
    if mode == "batch":
        ch, cw = cfg.cam_img_size
        # one full frame per batch; CamCalib broadcasts (whmr.py:194-199)
        args.append(jax.ShapeDtypeStruct((1, ch, cw, 3), jnp.uint8))
    elif mode == "split":
        args.append(jax.ShapeDtypeStruct((batch_size, 3, 3), f32))  # cam_rotmat
    return tuple(args)


def make_camcalib_fn(cfg: WHMRConfig, model, treedef):
    """Standalone CamCalib graph for "split" bundles: one uint8 full frame
    -> (cam_rotmat, render_rotmat), both (1, 3, 3). The frozen twin of the
    live pipeline's `_cam_fwd` (pipeline.py), letting a frozen-bundle
    daemon run calibration once per unique frame and coalesce crops from
    different frames into shared device batches."""
    from whmr_tpu.models.whmr import WHMR

    def cam(flat, full_u8):
        variables, _consts = jax.tree.unflatten(treedef, flat)
        mean = jnp.asarray(IMG_NORM_MEAN, jnp.float32)
        std = jnp.asarray(IMG_NORM_STD, jnp.float32)
        full_x = (full_u8.astype(jnp.float32) / 255.0 - mean) / std
        cam_rotmat, render_rotmat = model.apply(
            variables, full_x, train=False, method=WHMR.camcalib
        )
        return {"cam_rotmat": cam_rotmat, "render_rotmat": render_rotmat}

    return cam


def export_camcalib(
    cfg: WHMRConfig,
    model,
    variables,
    consts,
    platforms: Tuple[str, ...] = ("cpu", "tpu"),
):
    """Lower + export the standalone CamCalib graph (split bundles)."""
    flat, treedef = jax.tree.flatten((variables, consts))
    flat_structs = [
        jax.ShapeDtypeStruct(
            np.shape(a), getattr(a, "dtype", None) or np.asarray(a).dtype
        )
        for a in flat
    ]
    ch, cw = cfg.cam_img_size
    cam = make_camcalib_fn(cfg, model, treedef)
    return jax.export.export(jax.jit(cam), platforms=list(platforms))(
        flat_structs, jax.ShapeDtypeStruct((1, ch, cw, 3), jnp.uint8)
    )


def export_serving(
    cfg: WHMRConfig,
    model,
    variables,
    consts,
    batch_size: Optional[int],
    camcalib: bool = False,
    platforms: Tuple[str, ...] = ("cpu", "tpu"),
    variant: str = "demo",
):
    """Lower + export the serving forward. Returns (Exported, flat leaves).

    variant: "demo" (uint8 crops + optional CamCalib frame -> vis dict) or
    "eval" (normalized fp32 crops + GT cam_rotmat -> metric-protocol dict).
    """
    if variant not in ("demo", "eval"):
        raise ValueError(f"unknown export variant {variant!r}")
    if variant == "eval" and camcalib:
        raise ValueError(
            "camcalib is a demo-graph branch; the eval protocol feeds the "
            "GT cam_rotmat instead (eval.py:157-163)"
        )
    flat, treedef = jax.tree.flatten((variables, consts))
    flat_structs = [
        jax.ShapeDtypeStruct(
            np.shape(a), getattr(a, "dtype", None) or np.asarray(a).dtype
        )
        for a in flat
    ]
    if variant == "eval":
        serve = make_eval_serving_fn(cfg, model, treedef)
        args = eval_arg_structs(cfg, batch_size)
    else:
        serve = make_serving_fn(cfg, model, treedef, camcalib)
        args = batch_arg_structs(cfg, batch_size, camcalib)
    exp = jax.export.export(jax.jit(serve), platforms=list(platforms))(
        flat_structs, *args
    )
    return exp, flat


def save_exported(
    out_dir: str,
    exp,
    flat,
    cfg: WHMRConfig,
    batch_size: Optional[int],
    camcalib,
    variant: str = "demo",
    cam_exp=None,
) -> None:
    mode = _cam_mode(camcalib)
    if (mode == "split") != (cam_exp is not None):
        raise ValueError(
            "camcalib='split' bundles carry a second exported graph: pass "
            "cam_exp=export_camcalib(...) iff camcalib == 'split'"
        )
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, EXPORT_GRAPH), "wb") as f:
        f.write(exp.serialize())
    if cam_exp is not None:
        with open(os.path.join(out_dir, EXPORT_CAM_GRAPH), "wb") as f:
            f.write(cam_exp.serialize())
    arrays = {}
    dtypes = []
    for i, a in enumerate(flat):
        a = np.asarray(jax.device_get(a))
        dtypes.append(str(a.dtype))
        if a.dtype == jnp.bfloat16:
            a = a.astype(np.float32)  # npz cannot store bf16
        arrays[f"{i:05d}"] = a
    # compressed: the SMPL consts (dense Dmap/posedirs matrices) are mostly
    # zeros — ~216 MB raw shrinks by an order of magnitude
    np.savez_compressed(os.path.join(out_dir, EXPORT_WEIGHTS), **arrays)
    meta = {
        "format_version": 1,
        "jax_version": jax.__version__,
        "platforms": list(exp.platforms),
        "batch_size": batch_size or 0,  # 0 = batch-polymorphic
        "camcalib": mode is not None,
        # absent/"batch" in older bundles; "split" = separate per-frame
        # CamCalib graph + per-crop cam_rotmat main-graph input
        "camcalib_mode": mode or "",
        "variant": variant,
        "crop_hw": list(cfg.crop_hw),
        "cam_img_size": list(cfg.cam_img_size),
        "n_weights": len(flat),
        "weight_dtypes": dtypes,
        "output_keys": list(
            EVAL_OUTPUT_KEYS if variant == "eval" else OUTPUT_KEYS
        ),
        "img_norm_mean": list(IMG_NORM_MEAN),
        "img_norm_std": list(IMG_NORM_STD),
    }
    with open(os.path.join(out_dir, EXPORT_META), "w") as f:
        json.dump(meta, f, indent=1)


class ExportedWHMR:
    """Serving-side loader: needs only jax + numpy, no model code.

    >>> served = ExportedWHMR("export_dir/")
    >>> out = served(x_u8, center, scale, bbox_height, orig_shape, bbox_info)
    >>> out["verts"].shape   # (B, 6890, 3)
    """

    def __init__(self, path: str):
        with open(os.path.join(path, EXPORT_META)) as f:
            self.meta = json.load(f)
        with open(os.path.join(path, EXPORT_GRAPH), "rb") as f:
            self.exported = jax.export.deserialize(f.read())
        z = np.load(os.path.join(path, EXPORT_WEIGHTS))
        self.weights = [
            jnp.asarray(z[f"{i:05d}"], dtype=self.meta["weight_dtypes"][i])
            for i in range(self.meta["n_weights"])
        ]
        self.batch_size = self.meta["batch_size"] or None  # None = any
        self.camcalib = self.meta["camcalib"]
        # pre-split bundles carry no mode key; all of them are batch-global
        self.camcalib_mode = (
            self.meta.get("camcalib_mode") or ("batch" if self.camcalib else "")
        )
        # absent in format_version-1 bundles, which are all demo-variant
        self.variant = self.meta.get("variant", "demo")
        # jit the exported callable ONCE: repeated serving calls then take
        # the compiled-dispatch fast path instead of re-tracing exp.call
        self._call = jax.jit(self.exported.call)
        self._cam_call = None
        if self.camcalib_mode == "split":
            with open(os.path.join(path, EXPORT_CAM_GRAPH), "rb") as f:
                self._cam_call = jax.jit(jax.export.deserialize(f.read()).call)

    def __call__(
        self,
        x_u8: np.ndarray,
        center: np.ndarray,
        scale: np.ndarray,
        bbox_height: np.ndarray,
        orig_shape: np.ndarray,
        bbox_info: np.ndarray,
        full_u8: Optional[np.ndarray] = None,
        cam_rotmat: Optional[np.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        if self.variant != "demo":
            raise ValueError(
                f"this is a {self.variant!r}-variant bundle; use call_eval "
                "(or whmr-eval --bundle), not the demo serving call"
            )
        args = [self.weights, x_u8, center, scale, bbox_height, orig_shape,
                bbox_info]
        if self.camcalib_mode == "batch":
            if full_u8 is None:
                raise ValueError(
                    "this artifact was exported with camcalib='batch'; pass "
                    "full_u8 (1, H, W, 3) uint8"
                )
            args.append(full_u8)
        elif self.camcalib_mode == "split":
            render = None
            if cam_rotmat is None:
                if full_u8 is None:
                    raise ValueError(
                        "this artifact was exported with camcalib='split'; "
                        "pass per-crop cam_rotmat (B, 3, 3) — or full_u8, "
                        "from which camcalib_fn derives it"
                    )
                d = self.camcalib_fn(full_u8)
                b = np.shape(x_u8)[0]
                cam_rotmat = np.broadcast_to(
                    np.asarray(d["cam_rotmat"]), (b, 3, 3)
                ).astype(np.float32)
                render = np.broadcast_to(
                    np.asarray(d["render_rotmat"]), (b, 3, 3)
                ).astype(np.float32)
            if isinstance(cam_rotmat, np.ndarray):
                cam_rotmat = np.ascontiguousarray(cam_rotmat)
            args.append(cam_rotmat)
            out = dict(self._call(*args))
            if render is not None:
                # the main graph echoes cam_rotmat as render_rotmat; give
                # the caller the true pitch-flipped overlay rotation. With
                # a caller-supplied cam_rotmat the echo stands (the caller
                # holds the camcalib_fn outputs and can substitute).
                out["render_rotmat"] = render
            return out
        return self._call(*args)

    def camcalib_fn(self, full_u8: np.ndarray) -> Dict[str, jnp.ndarray]:
        """Split-bundle CamCalib graph: (1, H, W, 3) uint8 full frame ->
        {'cam_rotmat', 'render_rotmat'}, each (1, 3, 3). Run ONCE per
        unique frame; its cam_rotmat rides every crop row of that frame
        through __call__ (the coalesced-serving protocol)."""
        if self._cam_call is None:
            raise ValueError(
                "no camcalib graph in this bundle: only camcalib='split' "
                "exports carry one (whmr-export --camcalib split)"
            )
        return self._cam_call(self.weights, full_u8)

    def call_eval(self, img, center, scale, bbox_height, orig_shape,
                  bbox_info, cam_rotmat) -> Dict[str, jnp.ndarray]:
        """Eval-variant forward (EVAL_OUTPUT_KEYS). `img` is the loader's
        normalized fp32 crop batch; `cam_rotmat` the GT camera rotation.

        Traceable: called inside a jitted metric step it inlines the
        exported StableHLO into the surrounding graph, so pass the weights
        as that jit's ARGUMENT (never close over them — the axon
        remote-compile 413 lesson)."""
        if self.variant != "eval":
            raise ValueError(
                f"this is a {self.variant!r}-variant bundle; eval bundles "
                "are produced by whmr-export --eval"
            )
        return self._call(self.weights, img, center, scale, bbox_height,
                          orig_shape, bbox_info, cam_rotmat)


def load_exported(path: str) -> ExportedWHMR:
    return ExportedWHMR(path)
