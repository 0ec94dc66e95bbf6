"""Demo inference pipeline: images -> detections -> crops -> WHMR -> outputs.

Equivalent of reference `demo/whmr_demo.py` + `demo/tester.py` (SPECTester
:40-222): detect people, build the per-person crop batch + bbox_info, run
the model, dump per-image pkl results, and render overlays.

TPU-first restructuring:
- The model runs at a FIXED batch size (pad + mask) so one compiled program
  serves every image regardless of person count — no per-image recompiles.
- Detection is a pluggable host-side stage (the reference treats its MPT
  YOLO detector as an external process boundary, tester.py:68-79): built-in
  backends are full-image single-person and bbox-file; external detectors
  plug in via the same interface.
- Overlay rendering runs on the host (native C++ rasterizer) overlapped
  with the next batch's device compute.
"""

from __future__ import annotations

import json
import os
import pickle
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

from whmr_tpu.config import WHMRConfig, IMG_NORM_MEAN, IMG_NORM_STD
from whmr_tpu.data.assets import SMPLAssets


@dataclass
class Detection:
    """One person bbox: center (cx, cy) and square size (h=w), score.

    track_id is assigned by the video path's TrackingDetector (-1 = none).
    """

    cx: float
    cy: float
    size: float
    score: float = 1.0
    track_id: int = -1


class FullImageDetector:
    """Single-person fallback: the whole image is the person bbox."""

    def __call__(self, image: np.ndarray) -> List[Detection]:
        h, w = image.shape[:2]
        return [Detection(w / 2.0, h / 2.0, max(h, w) * 1.0, 1.0)]


class BboxFileDetector:
    """Read per-image bboxes from a json: {filename: [[x1,y1,x2,y2], ...]}.

    Covers the reference's precomputed-detection workflows (AGORA val
    crops carry detector boxes in the labels, evaluate/base_dataset.py:119).
    """

    def __init__(self, path: str):
        with open(path) as f:
            self.boxes = json.load(f)

    def __call__(self, image: np.ndarray, name: str = "") -> List[Detection]:
        dets = []
        for x1, y1, x2, y2 in self.boxes.get(name, []):
            cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
            size = max(x2 - x1, y2 - y1) * 1.1  # context margin as MPT does
            dets.append(Detection(cx, cy, size, 1.0))
        return dets


def prepare_crop_batch(
    cfg: WHMRConfig,
    image: np.ndarray,
    detections: Sequence[Detection],
    max_people: int,
    raw_uint8: bool = False,
) -> Dict[str, np.ndarray]:
    """Person crops + camera context, padded to max_people.

    Mirrors tester.py:100-149: 256x256 crop per detection (center/scale with
    scale = size/200), vitpose width slice, bbox_info 5-vector over the
    pseudo-focal sqrt(h^2+w^2).
    """
    from whmr_tpu.data.augment import crop_image, normalize_image

    h, w = image.shape[:2]
    res = cfg.img_res
    n = min(len(detections), max_people)
    crop_h, crop_w = cfg.crop_hw

    imgs = np.zeros(
        (max_people, crop_h, crop_w, 3), np.uint8 if raw_uint8 else np.float32
    )
    centers = np.zeros((max_people, 2), np.float32)
    scales = np.zeros((max_people,), np.float32) + 1.0
    bbox_heights = np.zeros((max_people,), np.float32) + 1.0
    valid = np.zeros((max_people,), np.float32)

    focal = np.sqrt(h * h + w * w)
    bbox_infos = np.zeros((max_people, 5), np.float32)

    # Crop straight from the source frame: uint8 warpAffine for the uint8
    # feed (matches the training loader, npz_dataset.py:193-199 — the
    # reference quantizes crops to uint8 too, imutils.crop:87), one f32
    # conversion OUTSIDE the loop otherwise. The previous per-detection
    # image.astype(np.float32) copied the whole frame once per person
    # (~24 MB x N at 1080p) on the serving hot path.
    crop_src = image
    if not (raw_uint8 and image.dtype == np.uint8):
        crop_src = image.astype(np.float32)
    for i, det in enumerate(detections[:n]):
        center = np.array([det.cx, det.cy], np.float32)
        scale = det.size / 200.0
        crop = crop_image(crop_src, center, scale, res)
        if cfg.pymaf.backbone == "vitpose":
            crop = crop[:, 32:-32]
        if raw_uint8:
            # normalization happens on device (quarter the host->device
            # bytes through slow transports)
            imgs[i] = (crop if crop.dtype == np.uint8
                       else np.clip(crop, 0, 255).astype(np.uint8))
        else:
            imgs[i] = normalize_image(crop / 255.0)
        centers[i] = center
        scales[i] = scale
        bbox_heights[i] = det.size
        valid[i] = 1.0
        bbox_infos[i] = (
            np.array(
                [det.cx - w / 2.0, det.cy - h / 2.0, det.size, w, h], np.float32
            )
            / focal
        )

    return {
        "x": imgs,
        "center": centers,
        "scale": scales,
        "bbox_height": bbox_heights,
        "orig_shape": np.tile(np.array([[h, w]], np.float32), (max_people, 1)),
        "bbox_info": bbox_infos,
        "valid": valid,
    }


def prepare_full_image(cfg: WHMRConfig, image: np.ndarray, raw_uint8: bool = False) -> np.ndarray:
    """CamCalib input: resize so the long side is cam_img_size, pad square
    (reference tester.py:100-104 resizes to 600)."""
    th, tw = cfg.cam_img_size
    h, w = image.shape[:2]
    s = min(th / h, tw / w)
    resized = cv2.resize(image, (int(w * s), int(h * s)))
    if raw_uint8:
        canvas = np.zeros((th, tw, 3), np.uint8)
        canvas[: resized.shape[0], : resized.shape[1]] = resized
        return canvas
    from whmr_tpu.data.augment import normalize_image

    canvas = np.zeros((th, tw, 3), np.float32)
    canvas[: resized.shape[0], : resized.shape[1]] = resized
    return normalize_image(canvas / 255.0).astype(np.float32)


def call_detector(detector, image: np.ndarray, name: str = ""):
    """Invoke a pluggable detector: `(image, name)` if it takes one,
    else `(image)` — the single calling convention for every consumer
    (DemoPipeline, whmr-serve)."""
    try:
        return detector(image, name)
    except TypeError:
        return detector(image)


def detections_array(dets: Sequence[Detection]) -> np.ndarray:
    """The response-schema detections matrix. Columns: cx, cy, size,
    score, track_id (-1 when untracked) — one definition shared by
    DemoPipeline.collect and the serving batcher."""
    return np.array(
        [[d.cx, d.cy, d.size, d.score, d.track_id] for d in dets],
        np.float32,
    ).reshape(len(dets), 5)


class DemoPipeline:
    """Folder-mode demo runner (reference tester.run_on_image_folder)."""

    def __init__(
        self,
        cfg: WHMRConfig,
        variables,
        assets: SMPLAssets,
        max_people: int = 8,
        detector=None,
        use_camcalib: bool = True,
        dtype=None,
        bundle: str = None,
        mesh=None,
    ):
        """bundle: path to a whmr-export directory — the demo then runs the
        frozen AOT graph (ExportedWHMR) instead of building the live model;
        `variables` may be None in that mode (weights live in the bundle).

        mesh: a `jax.sharding.Mesh` with ('data', 'model') axes — the crop
        batch is sharded over 'data' (rows are independent, so N chips
        serve N× the per-batch capacity; net-new vs the reference, whose
        demo is single-GPU, demo/tester.py:151-162) and, when the 'model'
        axis is >1, the ViT block weights split over it via the Megatron
        TP rules (parallel/mesh.py — latency scaling for the L/H
        variants). The CamCalib full frame (batch 1) is replicated.
        Requires `max_people % data_axis == 0` and a live model (exported
        bundles are traced for one device)."""
        import jax
        import jax.numpy as jnp

        self.cfg = cfg
        self.assets = assets
        self.max_people = max_people
        self.detector = detector or FullImageDetector()
        self.use_camcalib = use_camcalib
        if mesh is not None:
            if bundle is not None:
                raise ValueError(
                    "data-parallel serving needs the live model: an exported "
                    "bundle is traced for a single device (re-export is not "
                    "enough — jax.export fixes the device assignment)"
                )
            data_axis = mesh.shape["data"]
            if max_people % data_axis != 0:
                raise ValueError(
                    f"max_people={max_people} must be divisible by the "
                    f"mesh data axis ({data_axis}) to shard the crop batch"
                )
        if bundle is not None:
            # frozen graph ignores consts (weights + consts live in the
            # bundle); skip the model-stack imports — bundle serving needs
            # only jax + numpy (inference/export.py contract)
            self.consts = None
            self._init_from_bundle(bundle)
            return

        from whmr_tpu.models.regressor import body_consts_from_assets
        from whmr_tpu.models.whmr import WHMR

        self.consts = body_consts_from_assets(assets)
        self.model = WHMR(cfg, dtype=dtype or jnp.float32)
        self.variables = variables

        def fwd(variables, consts, batch, full_u8):
            # uint8 in, normalize on device: 4x fewer transfer bytes and the
            # full frame ships ONCE (CamCalib result broadcasts per person).
            mean = jnp.asarray(IMG_NORM_MEAN, jnp.float32)
            std = jnp.asarray(IMG_NORM_STD, jnp.float32)
            x = (batch["x"].astype(jnp.float32) / 255.0 - mean) / std
            full_x = None
            if full_u8 is not None:
                full_x = (full_u8.astype(jnp.float32) / 255.0 - mean) / std
            out = self.model.apply(
                variables,
                consts,
                x,
                batch["center"],
                batch["scale"],
                batch["bbox_height"],
                batch["orig_shape"],
                batch["bbox_info"],
                train=False,
                full_x=full_x,
                # per-crop precomputed camera rotation (the coalesced-
                # serving path: CamCalib ran separately per unique frame)
                cam_rotmat=batch.get("cam_rotmat"),
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

        if mesh is None:
            self._fwd = jax.jit(fwd)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from whmr_tpu.parallel import shard_params

            rep = NamedSharding(mesh, P())
            dp = NamedSharding(mesh, P("data"))
            # Crop batch row-sharded over 'data'; CamCalib frame (batch 1)
            # and SMPL consts replicated. Weights go through the Megatron
            # TP rules: with a >1 'model' axis the ViT qkv/proj/MLP split
            # over it (GSPMD inserts the activation collectives), otherwise
            # everything is replicated — either way rows are independent,
            # so outputs match the single-device graph.
            self.variables = shard_params(self.variables, mesh)
            self.consts = jax.device_put(self.consts, rep)
            var_shardings = jax.tree_util.tree_map(
                lambda x: x.sharding, self.variables
            )
            self._fwd = jax.jit(fwd, in_shardings=(var_shardings, rep, dp, rep))

        def cam_fwd(variables, full_u8):
            mean = jnp.asarray(IMG_NORM_MEAN, jnp.float32)
            std = jnp.asarray(IMG_NORM_STD, jnp.float32)
            full_x = (full_u8.astype(jnp.float32) / 255.0 - mean) / std
            from whmr_tpu.models.whmr import WHMR

            return self.model.apply(
                variables, full_x, train=False, method=WHMR.camcalib
            )

        # CamCalib-only graph for coalesced serving: one call per UNIQUE
        # frame, crops then batch with per-crop cam_rotmat (serve_cli
        # BatchingExecutor). Lazy jit; unused unless camcalib coalescing.
        self._cam_fwd = jax.jit(cam_fwd)

    def _init_from_bundle(self, bundle: str) -> None:
        """Serve the demo from a whmr-export bundle: the frozen AOT graph
        takes the same uint8 crop batch + optional full frame and returns
        the same output dict as the live `fwd` above (export.OUTPUT_KEYS),
        so dispatch_image/collect need no changes."""
        from whmr_tpu.inference.export import load_exported

        served = load_exported(bundle)
        if served.variant != "demo":
            raise ValueError(
                f"{bundle} is a {served.variant!r}-variant bundle (metric "
                "protocol graph); the demo needs a demo-variant export "
                "(whmr-export without --eval)"
            )
        if served.camcalib != self.use_camcalib:
            raise ValueError(
                f"bundle was exported with camcalib={served.camcalib} but "
                f"the pipeline wants use_camcalib={self.use_camcalib}; "
                "re-export or pass the matching flag"
            )
        if served.batch_size is not None and served.batch_size != self.max_people:
            raise ValueError(
                f"bundle has fixed batch {served.batch_size} but "
                f"max_people={self.max_people}; re-export with "
                f"--batch_size {self.max_people} (or 0 for polymorphic)"
            )
        if (served.batch_size is None
                and getattr(served, "camcalib_mode", "") == "batch"
                and self.max_people < 2):
            # polymorphic batch-camcalib exports constrain the symbolic
            # batch to B >= 2 (export.batch_arg_structs) so the broadcast
            # stays shape-polymorphic; fail here, not in the exported graph
            raise ValueError(
                "camcalib-polymorphic bundles need max_people >= 2 "
                f"(got {self.max_people})"
            )
        for key, want in (
            ("crop_hw", tuple(self.cfg.crop_hw)),
            ("cam_img_size", tuple(self.cfg.cam_img_size)),
        ):
            have = tuple(served.meta.get(key, want))
            if have != want:
                raise ValueError(
                    f"bundle was exported with {key}={list(have)} but the "
                    f"pipeline config has {list(want)}; pass the --cfg_file "
                    "the bundle was exported with"
                )
        self.model = None
        self.variables = None
        self._served = served  # exposed for servers (whmr-serve /meta)

        if getattr(served, "camcalib_mode", "") == "split":
            # split bundle: a second frozen graph runs CamCalib per frame
            # and the main graph takes per-crop cam_rotmat — the frozen
            # twin of the live coalesced-serving path below.
            def fwd(_variables, _consts, batch, full_u8):
                # ExportedWHMR.__call__ owns the split protocol (per-frame
                # camcalib_fn, (B,3,3) broadcast, render_rotmat
                # substitution — export.py): with per-crop cam_rotmat in
                # the batch (coalesced serving) it passes through, with
                # full_u8 (demo path, one shared frame) it calibrates there
                return dict(served(
                    batch["x"], batch["center"], batch["scale"],
                    batch["bbox_height"], batch["orig_shape"],
                    batch["bbox_info"], full_u8=full_u8,
                    cam_rotmat=batch.get("cam_rotmat"),
                ))

            def cam_fwd(_variables, full_u8):
                d = served.camcalib_fn(np.asarray(full_u8))
                return d["cam_rotmat"], d["render_rotmat"]

            self._fwd = fwd
            self._cam_fwd = cam_fwd
            return

        def fwd(_variables, _consts, batch, full_u8):
            return served(
                batch["x"], batch["center"], batch["scale"],
                batch["bbox_height"], batch["orig_shape"], batch["bbox_info"],
                full_u8=full_u8,
            )

        self._fwd = fwd
        # 'batch'-mode camcalib bundles trace CamCalib inside the frozen
        # graph (the frame is batch-global): no standalone camcalib entry,
        # so camcalib coalescing needs a 'split' bundle or the live model
        self._cam_fwd = None

    def dispatch_image(self, image: np.ndarray, name: str = "", dets=None):
        """Async half of run_image: detect + crop on host, dispatch the
        jitted forward WITHOUT fetching. Returns an opaque pending handle;
        JAX dispatch is asynchronous, so the device computes while the
        caller overlaps host work (rendering, IO, the next image's crops).

        dets: explicit Detection list, bypassing self.detector for this
        image (a serving request that carries its own bboxes)."""
        import jax.numpy as jnp

        if dets is None:
            dets = call_detector(self.detector, image, name)
        batch = prepare_crop_batch(
            self.cfg, image, dets, self.max_people, raw_uint8=True
        )
        full_x = None
        if self.use_camcalib:
            full_x = jnp.asarray(
                prepare_full_image(self.cfg, image, raw_uint8=True)[None]
            )
        out = self._fwd(
            self.variables,
            self.consts,
            {k: jnp.asarray(v) for k, v in batch.items() if k != "valid"},
            full_x,
        )
        return out, batch, dets

    def collect(self, pending) -> Dict[str, np.ndarray]:
        """Blocking half: fetch a dispatch_image handle to host arrays."""
        import jax

        out, batch, dets = pending
        n = int(batch["valid"].sum())
        # One bulk device->host fetch (per-array np.asarray costs one tunnel
        # round trip EACH on remote transports).
        out_host = jax.device_get(out)
        result = {k: v[:n] for k, v in out_host.items()}
        result["n_people"] = n
        # the track_id column lets a consumer regroup person slots across
        # frames (see detections_array for the schema)
        result["detections"] = detections_array(dets[:n])
        return result

    def run_image(self, image: np.ndarray, name: str = "",
                  dets=None) -> Dict[str, np.ndarray]:
        return self.collect(self.dispatch_image(image, name, dets=dets))

    def run_folder(
        self,
        image_folder: str,
        output_folder: str,
        render: bool = True,
        save_obj_files: bool = False,
        pipeline_depth: int = 1,
    ) -> Dict[str, float]:
        os.makedirs(output_folder, exist_ok=True)
        names = sorted(
            f
            for f in os.listdir(image_folder)
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        t0 = time.time()
        n_people = 0
        # Software pipeline: the next `pipeline_depth` images' detector/
        # crops/forward are dispatched before image i's results are
        # fetched, so the device (and the tunnel round trip on remote
        # transports) overlaps the host-side rendering + pkl/png IO
        # instead of serializing with it. Each in-flight slot holds one
        # max_people crop batch on device (small); depth 1 already
        # captured most of the win in measurement (BASELINE.md).
        queue: List[Tuple[str, np.ndarray, object]] = []

        def drain():
            nonlocal n_people
            fname, img, pending = queue.pop(0)
            result = self.collect(pending)
            n = result["n_people"]
            n_people += n
            self._emit(
                output_folder, fname, img, result, render, save_obj_files
            )

        for fname in names:
            raw = cv2.imread(os.path.join(image_folder, fname))
            if raw is None:
                print(f"[demo] WARNING: unreadable image skipped: {fname}")
                continue
            img = np.ascontiguousarray(raw[:, :, ::-1])
            queue.append((fname, img, self.dispatch_image(img, fname)))
            if len(queue) > max(1, pipeline_depth):
                drain()
        while queue:
            drain()
        dt = time.time() - t0
        fps = len(names) / dt if dt > 0 else 0.0
        return {"images": len(names), "people": n_people, "fps": fps}

    def _emit(
        self,
        output_folder: str,
        fname: str,
        img: np.ndarray,
        result: Dict[str, np.ndarray],
        render: bool,
        save_obj_files: bool,
    ) -> None:
        from whmr_tpu.inference.renderer import render_overlay, render_side_view, save_obj

        n = result["n_people"]
        stem = os.path.splitext(fname)[0]
        with open(os.path.join(output_folder, f"{stem}.pkl"), "wb") as f:
            pickle.dump(result, f)
        if render and n > 0:
            # render_rotmat rides every view, matching the reference's
            # camera pose (renderer_cam.py:108-110, render_image_group
            # :173-215); side views add the checkerboard ground plane.
            render_rotmat = result["render_rotmat"][0]
            overlay = render_overlay(
                img,
                [result["verts"][i] for i in range(n)],
                [result["pred_cam_t"][i] for i in range(n)],
                self.assets.faces,
                result["focal_length"][:n],
                cam_rotmat=render_rotmat,
            )
            side_local = render_side_view(
                [result["verts"][i] for i in range(n)],
                [result["pred_cam_t"][i] for i in range(n)],
                self.assets.faces, 1000.0, (img.shape[0], img.shape[0]),
                rotmat=render_rotmat, ground=True,
            )
            side_world = render_side_view(
                [result["verts_world"][i] for i in range(n)],
                [result["pred_cam_t"][i] for i in range(n)],
                self.assets.faces, 1000.0, (img.shape[0], img.shape[0]),
                rotmat=render_rotmat, ground=True,
            )
            panel = np.concatenate(
                [overlay, side_local, side_world], axis=1
            )
            cv2.imwrite(
                os.path.join(output_folder, f"{stem}_overlay.png"),
                panel[:, :, ::-1],
            )
        if save_obj_files and n > 0:
            save_obj(
                os.path.join(output_folder, f"{stem}.obj"),
                result["verts_world"][0],
                self.assets.faces,
            )
