"""`whmr-eval` CLI (reference evaluate/eval.py:44-62, 364-385 surface).

Protocol variants carried over from the reference:
- `--dataset mpi-inf-3dhp` switches the joint mapper to J17
  (eval.py:150-151); every other pose dataset evaluates J14.
- `--gendered` builds male/female SMPL GT for 3DPW-style protocols
  (core/trainer.py:784-798); requires SMPL_MALE/FEMALE.pkl in --data_dir.
- `--result_file out.npz` dumps per-sample predictions (eval.py:312-319).
- `--eval_parts` runs the LSP mask/part-segmentation protocol
  (eval.py:145-148) against GT part maps on disk, scored with
  inference/part_segm.py instead of the neural_renderer CUDA path.
- labels without `cam_rotmat` abort unless `--allow_identity_cam`: the
  reference eval REQUIRES the GT camera rotation (eval.py:157-163), and a
  silent identity fallback produces quietly-wrong world-frame metrics.
- `--bundle dir/` (instead of `--checkpoint`) scores an eval-variant
  export (`whmr-export --eval`): the frozen StableHLO graph inlines into
  the jitted metric step, so the metrics gate the exact deployed
  artifact (net-new — the reference can only evaluate a live model).
"""

from __future__ import annotations

import argparse
import os

# Datasets whose reference protocol uses the 17-joint mapper (eval.py:150-151).
J17_DATASETS = ("mpi-inf-3dhp",)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Evaluate a WHMR checkpoint")
    p.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    p.add_argument("--bundle", default=None,
                   help="eval-variant export bundle (whmr-export --eval): "
                        "score the exact frozen serving artifact instead "
                        "of a live checkpoint")
    p.add_argument("--dataset_npz", required=True, help="eval label npz")
    p.add_argument("--img_dir", required=True)
    p.add_argument("--dataset", default="custom",
                   help="protocol name (3dpw, h36m-p2, mpi-inf-3dhp, lsp, ...)")
    p.add_argument("--regressor", default="pymaf_net",
                   choices=("pymaf_net", "hmr"),
                   help="model family (reference eval.py:52)")
    p.add_argument("--data_dir", default=None, help="asset dir")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--log_freq", type=int, default=10)
    p.add_argument("--result_file", default=None,
                   help="npz path for per-sample prediction dump")
    p.add_argument("--gendered", action="store_true",
                   help="use gendered SMPL GT (3DPW protocol)")
    p.add_argument("--allow_identity_cam", action="store_true",
                   help="proceed with identity cam_rotmat when labels lack it")
    p.add_argument("--eval_parts", action="store_true",
                   help="LSP mask/part-segmentation protocol")
    p.add_argument("--coco_ap", action="store_true",
                   help="COCO keypoint OKS-AP protocol (reference "
                        "datasets/coco_keypoint_dataset.py via pycocotools)")
    p.add_argument("--coco_gt", default=None,
                   help="COCO person_keypoints annotation json for --coco_ap")
    p.add_argument("--parts_dir", default=None,
                   help="directory of GT part maps (one png per sample)")
    p.add_argument("--parts_template", default="{stem}.png",
                   help="GT part-map filename from the image stem")
    p.add_argument("--data_parallel", type=int, default=0, metavar="N",
                   help="shard eval batches over N devices (0 = single "
                        "device; net-new vs the reference's rank-0-only "
                        "validation, train.py:44-47)")
    p.add_argument("--loader_procs", type=int, default=0,
                   help="fork-based loader worker processes (0 = threads); "
                        "same knob as whmr-train")
    p.add_argument("--cfg_file", default=None,
                   help="reference-style YAML config (e.g. configs/vit-l.yaml "
                        "for checkpoints trained at that scale)")
    p.add_argument("--misc", nargs="*", default=[],
                   help="dotted config overrides: key value [key value ...]")
    return p


_EVAL_MODEL_KEYS = ("img", "center", "scale", "bbox_height", "orig_shape",
                    "bbox_info")


def device_eval_batch(host_batch, extra_keys=(), warn_identity=False):
    """Shared device-batch prep for every eval protocol: model inputs +
    requested label keys, with the cam_rotmat fallback in ONE place (the
    metric protocols warn on the identity substitution; the 2D protocols
    — COCO AP, LSP parts — never use a GT camera, so they don't)."""
    import jax.numpy as jnp

    keys = _EVAL_MODEL_KEYS + tuple(extra_keys)
    b = {k: jnp.asarray(v) for k, v in host_batch.items() if k in keys}
    n = b["img"].shape[0]
    if "cam_rotmat" in host_batch:
        b["cam_rotmat"] = jnp.asarray(host_batch["cam_rotmat"])
    else:
        if warn_identity:
            print("[eval] WARNING: identity cam_rotmat substituted")
        b["cam_rotmat"] = jnp.broadcast_to(jnp.eye(3), (n, 3, 3))
    return b, n


def load_model_state(args, cfg):
    """Build model + restore checkpoint -> (model, variables, consts, assets)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from whmr_tpu.data.assets import get_assets
    from whmr_tpu.models.regressor import body_consts_from_assets
    from whmr_tpu.models.whmr import WHMR
    from whmr_tpu.training.train_step import create_train_state
    from whmr_tpu.utils.checkpoint import CheckpointManager
    from whmr_tpu.utils.testing import make_example_inputs

    assets = get_assets(args.data_dir)
    consts = body_consts_from_assets(assets)
    if getattr(args, "regressor", "pymaf_net") == "hmr":
        from whmr_tpu.models.hmr import HMR

        model = HMR()
        example = make_example_inputs(cfg, 2)
        variables0 = jax.jit(
            lambda c, x: model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                c, x, train=False,
            )
        )(consts, jnp.asarray(example["x"]))
        template = {
            "params": variables0["params"],
            "batch_stats": variables0.get("batch_stats", {}),
        }
    else:
        model = WHMR(cfg)
        example = make_example_inputs(cfg, 2)
        state = create_train_state(
            cfg, model, consts, jax.random.PRNGKey(0),
            {k: jnp.asarray(v) for k, v in example.items()},
        )
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.zeros((), np.int32),
            "epoch": 0,
            "batch_idx": 0,
        }
    ckpt = CheckpointManager(args.checkpoint)
    # accepts full-training AND weights-only payloads (checkpoints_ema,
    # whmr-convert output) for both template shapes (the HMR branch's
    # template has no optimizer)
    variables = ckpt.restore_weights(template)
    if variables is None:
        raise SystemExit(f"no checkpoint found in {args.checkpoint}")
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    return model, variables, consts, assets


def load_bundle_state(args, cfg):
    """Load an eval-variant export bundle for the metric protocols.

    Returns (model=None, variables=bundle weight leaves, consts, assets,
    forward_override, served). The weights ride the step's `variables`
    ARGUMENT (never a closure — the axon remote-compile 413 lesson) and
    the exported StableHLO graph inlines into the jitted metric step, so
    the scored forward is bit-identical to the deployed artifact."""
    from whmr_tpu.data.assets import get_assets
    from whmr_tpu.inference.export import load_exported
    from whmr_tpu.models.regressor import body_consts_from_assets

    served = load_exported(args.bundle)
    if served.variant != "eval":
        raise SystemExit(
            f"{args.bundle} is a {served.variant!r}-variant bundle; "
            "metric evaluation needs the eval graph (GT cam_rotmat input, "
            "world-frame outputs) — re-export with whmr-export --eval"
        )
    if getattr(args, "regressor", "pymaf_net") != "pymaf_net":
        raise SystemExit("--bundle carries the WHMR (pymaf_net) graph; "
                         "--regressor hmr needs a live --checkpoint")
    if args.eval_parts or args.coco_ap:
        raise SystemExit(
            "--eval_parts/--coco_ap need forward outputs (crop verts, "
            "full-image keypoints) the eval bundle does not export; use "
            "a live --checkpoint"
        )
    if args.data_parallel:
        raise SystemExit(
            "--data_parallel shards the live jitted step; the exported "
            "graph pins its own shapes — run the bundle single-device"
        )
    have = tuple(served.meta.get("crop_hw", cfg.crop_hw))
    if have != tuple(cfg.crop_hw):
        raise SystemExit(
            f"bundle was exported with crop_hw={list(have)} but the eval "
            f"config has {list(cfg.crop_hw)}; pass the --cfg_file the "
            "bundle was exported with"
        )
    if served.batch_size and args.batch_size > served.batch_size:
        raise SystemExit(
            f"{args.bundle} was exported with a fixed batch of "
            f"{served.batch_size}; pass --batch_size {served.batch_size} "
            "or smaller (smaller batches are padded), or re-export with "
            "--batch_size 0 for a polymorphic bundle"
        )
    assets = get_assets(args.data_dir)
    consts = body_consts_from_assets(assets)

    def forward_override(variables, consts, batch):
        out = served.exported.call(
            variables, batch["img"], batch["center"], batch["scale"],
            batch["bbox_height"], batch["orig_shape"], batch["bbox_info"],
            batch["cam_rotmat"],
        )
        last_params = {
            "pose": out["pose"],
            "pred_shape": out["shape"],
            "pred_cam": out["camera"],
        }
        return out["verts_world"], last_params

    return None, served.weights, consts, assets, forward_override, served


def main(argv=None):
    args = build_parser().parse_args(argv)

    from whmr_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp
    import numpy as np

    from whmr_tpu.config import config_from_args
    from whmr_tpu.data.loader import BatchLoader
    from whmr_tpu.data.npz_dataset import NpzDataset
    from whmr_tpu.inference.evaluate import run_evaluation

    cfg = config_from_args(args)
    if args.data_parallel and (args.eval_parts or args.coco_ap):
        # those protocol drivers run their own single-device loops; failing
        # beats silently evaluating unsharded under a sharding flag
        raise SystemExit(
            "--data_parallel is not supported with --eval_parts/--coco_ap"
        )
    if bool(args.bundle) == bool(args.checkpoint):
        raise SystemExit(
            "pass exactly one of --checkpoint (live model) or --bundle "
            "(frozen eval-variant export)"
        )
    forward_override = None
    if args.bundle:
        model, variables, consts, assets, forward_override, served = (
            load_bundle_state(args, cfg)
        )
    else:
        model, variables, consts, assets = load_model_state(args, cfg)

    ds = NpzDataset(cfg, args.dataset_npz, args.img_dir, is_train=False)
    loader = BatchLoader(ds, args.batch_size, shuffle=False, drop_last=False,
                         num_procs=args.loader_procs)

    if args.eval_parts:
        if not args.parts_dir:
            raise SystemExit("--eval_parts requires --parts_dir")
        result = run_parts_evaluation(args, cfg, model, variables, consts, assets, ds, loader)
        print(
            "*** Final Results ***\n"
            f"Mask Accuracy: {result['mask_accuracy']:.4f}\n"
            f"Mask F1: {result['mask_f1']:.4f}\n"
            f"Parts Accuracy: {result['parts_accuracy']:.4f}"
        )
        return

    if args.coco_ap:
        if not args.coco_gt:
            raise SystemExit("--coco_ap requires --coco_gt annotations.json")
        result = run_coco_ap_evaluation(args, cfg, model, variables, consts, ds, loader)
        print(
            "*** Final Results ***\n"
            f"AP: {result['AP']:.4f}\nAP50: {result['AP50']:.4f}\n"
            f"AP75: {result['AP75']:.4f}\nAR: {result['AR']:.4f}"
        )
        return

    if ds.cam_rotmat is None and not args.allow_identity_cam:
        raise SystemExit(
            "labels carry no 'cam_rotmat': world-frame metrics would be "
            "evaluated with an identity camera (wrong for any non-level "
            "camera). Provide eval labels with cam_rotmat (reference "
            "eval.py:157-163) or pass --allow_identity_cam to proceed."
        )
    if ds.cam_rotmat is not None and ds.global_pose is None:
        # Predictions are world-frame (rotated by cam_rotmat) but GT would
        # fall back to the crop-local 'pose' — frames would silently
        # mismatch and inflate MPJPE/PVE (PA-MPJPE hides it).
        raise SystemExit(
            "labels carry 'cam_rotmat' but no 'global_pose': world-frame "
            "predictions would be scored against camera-frame GT. Provide "
            "'global_pose' (reference eval labels carry both) or drop "
            "cam_rotmat and pass --allow_identity_cam for camera-frame eval."
        )

    gendered_smpl = None
    if args.gendered:
        from whmr_tpu.data.assets import get_assets
        from whmr_tpu.models.smpl import smpl_params_from_assets

        gendered_smpl = {
            "male": smpl_params_from_assets(get_assets(args.data_dir, "male")),
            "female": smpl_params_from_assets(get_assets(args.data_dir, "female")),
        }

    def batches():
        for host_batch in loader:
            b, _n = device_eval_batch(
                host_batch,
                extra_keys=("pose", "betas", "gender", "global_pose"),
                warn_identity=True,
            )
            b["valid"] = jnp.asarray(host_batch["has_smpl"])
            yield b

    mesh = None
    if args.data_parallel:
        from whmr_tpu.parallel import make_mesh

        mesh = make_mesh(args.data_parallel)

    joint_mapper = "j17" if args.dataset in J17_DATASETS else "j14"
    result = run_evaluation(
        cfg, model, variables, consts, batches(), log_every=args.log_freq,
        gendered_smpl=gendered_smpl, joint_mapper=joint_mapper,
        result_file=args.result_file, regressor=args.regressor, mesh=mesh,
        forward_override=forward_override,
        fixed_batch=served.batch_size if args.bundle else None,
    )
    print(
        f"*** Final Results ***\nPVE: {result['pve']:.2f}\n"
        f"MPJPE: {result['mpjpe']:.2f}\nPA-MPJPE (Reconstruction Error): {result['pa_mpjpe']:.2f}"
    )


def run_coco_ap_evaluation(args, cfg, model, variables, consts, ds, loader):
    """COCO keypoint OKS-AP protocol (VERDICT round-2 item 4).

    Reference counterpart: datasets/coco_keypoint_dataset.py:16 +
    datasets/JointsDataset.py score predictions with pycocotools
    COCOeval(iouType='keypoints'); here the model's 49-joint full-image
    keypoints (kp_2d_w, normalized to [-1, 1]) are unnormalized to pixels,
    mapped to COCO-17 by name, and scored by the native OKS-AP
    implementation (inference/coco_eval.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from whmr_tpu.inference.coco_eval import (
        evaluate_oks_ap,
        load_coco_gt,
        spin49_to_coco17,
    )

    gts, name_to_id = load_coco_gt(args.coco_gt, return_name_to_id=True)

    def fwd(variables, consts, batch):
        preds = model.apply(
            variables, consts, batch["img"], batch["center"], batch["scale"],
            batch["bbox_height"], batch["orig_shape"], batch["bbox_info"],
            train=False, cam_rotmat=batch["cam_rotmat"],
        )
        return preds["smpl_out"][-1]["kp_2d_w"]

    fwd_j = jax.jit(fwd)
    det_score = getattr(ds, "det_score", None)
    dts = {}
    for host_batch in loader:
        b, n = device_eval_batch(host_batch)
        kp_w = np.asarray(fwd_j(variables, consts, b))  # (B, 49, 2) in [-1,1]
        # unnormalize: px = (kp + 1) * (W/2, H/2) (inverse of regressor.py
        # kp_2d_w normalization)
        centers = host_batch["orig_shape"][:, ::-1] / 2.0  # (W/2, H/2)
        kp_px = (kp_w + 1.0) * centers[:, None, :]
        kp17, _ = spin49_to_coco17(kp_px)
        for i in range(n):
            idx = int(host_batch["sample_index"][i])
            name = os.path.basename(str(ds.imgname[idx]))
            if name not in name_to_id:
                print(f"[eval] WARNING: no COCO image entry for {name}; skipped")
                continue
            img_id = name_to_id[name]
            entry = dts.setdefault(img_id, {"kps": [], "scores": []})
            entry["kps"].append(kp17[i])
            entry["scores"].append(
                float(det_score[idx]) if det_score is not None else 1.0
            )
    dts = {
        k: {"kps": np.stack(v["kps"]), "scores": np.asarray(v["scores"])}
        for k, v in dts.items()
    }
    return evaluate_oks_ap(gts, dts)


def run_parts_evaluation(args, cfg, model, variables, consts, assets, ds, loader):
    """LSP mask/part protocol: render predicted 6-part maps in the crop
    frame, score against GT part pngs (reference eval.py:145-148 +
    utils/part_utils.py, rebuilt on the JAX rasterizer)."""
    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from whmr_tpu.data.augment import crop_image
    from whmr_tpu.inference.part_segm import (
        render_part_segmentation,
        segmentation_metrics,
    )

    res = (cfg.img_res[1], cfg.img_res[0])  # (H, W)

    def fwd(variables, consts, batch):
        preds = model.apply(
            variables, consts, batch["img"], batch["center"], batch["scale"],
            batch["bbox_height"], batch["orig_shape"], batch["bbox_info"],
            train=False, cam_rotmat=batch.get("cam_rotmat"),
        )
        last = preds["smpl_out"][-1]
        return last["verts"], last["pred_cam"]

    fwd_j = jax.jit(fwd)
    agg = {"mask_accuracy": 0.0, "mask_f1": 0.0, "parts_accuracy": 0.0}
    count = 0
    for host_batch in loader:
        b, n = device_eval_batch(host_batch)
        verts, cam = fwd_j(variables, consts, b)
        pred_parts = np.asarray(
            render_part_segmentation(assets, verts, cam, resolution=res)
        )
        for i in range(n):
            idx = int(host_batch["sample_index"][i])
            stem = os.path.splitext(os.path.basename(str(ds.imgname[idx])))[0]
            gt_path = os.path.join(
                args.parts_dir, args.parts_template.format(stem=stem)
            )
            if not os.path.exists(gt_path):
                continue
            gt_full = cv2.imread(gt_path, cv2.IMREAD_GRAYSCALE)
            if gt_full is None:
                print(f"[eval] WARNING: unreadable GT part map skipped: {gt_path}")
                continue
            # GT part maps are full-image; crop with the eval bbox,
            # nearest-neighbor so labels stay integral.
            gt_crop = crop_image(
                gt_full.astype(np.float32), ds.center[idx], float(ds.scale[idx]),
                cfg.img_res, nearest=True,
            ).astype(np.int32)
            m = segmentation_metrics(pred_parts[i], gt_crop)
            for k in agg:
                agg[k] += m[k]
            count += 1
    if count == 0:
        raise SystemExit(f"no GT part maps matched in {args.parts_dir}")
    return {k: v / count for k, v in agg.items()}


if __name__ == "__main__":
    main()
