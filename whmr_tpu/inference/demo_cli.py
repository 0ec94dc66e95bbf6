"""`whmr-demo` CLI (reference demo/whmr_demo.py:93-172 surface)."""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="WHMR folder-mode demo")
    p.add_argument("--image_folder", required=True)
    p.add_argument("--output_folder", default="output")
    p.add_argument("--checkpoint", default=None, help="orbax checkpoint dir (random init if omitted)")
    p.add_argument("--data_dir", default=None, help="asset dir")
    p.add_argument(
        "--detector", default=None, choices=["full", "file", "iuv", "contour"],
        help="person detector: iuv (model's dense-IUV head — needs trained "
             "weights), contour (foreground blobs), full (whole image), "
             "file (--bbox_file json). Default: iuv when --checkpoint is "
             "given, full otherwise (an untrained IUV head detects nothing).",
    )
    p.add_argument("--bbox_file", default=None, help="json bboxes for --detector file")
    p.add_argument("--max_people", type=int, default=8)
    p.add_argument("--data_parallel", type=int, default=0, metavar="N",
                   help="shard each crop batch over an N-device data mesh "
                        "(live model only; max_people must divide by N)")
    p.add_argument("--tensor_parallel", type=int, default=0, metavar="M",
                   help="split ViT block weights over an M-device model "
                        "axis (Megatron rules; latency scaling for "
                        "ViT-L/H); composes with --data_parallel (dp*tp "
                        "chips total)")
    p.add_argument("--no_render", action="store_true")
    p.add_argument("--save_obj", action="store_true")
    p.add_argument("--no_camcalib", action="store_true")
    p.add_argument("--bundle", default=None,
                   help="whmr-export bundle dir: run the frozen AOT graph "
                        "instead of building the model (no --checkpoint "
                        "needed; bundle batch must equal --max_people or be "
                        "polymorphic)")
    p.add_argument("--cfg_file", default=None,
                   help="reference-style YAML config (e.g. configs/vit-l.yaml)")
    p.add_argument("--dtype", default="fp32", choices=["fp32", "bf16"],
                   help="live-model compute dtype; fp32 matches the torch "
                        "reference demo, bf16 is ~2x on TPU (the headline "
                        "bench's setting). Bundles fix their dtype at "
                        "export time")
    p.add_argument("--misc", nargs="*", default=[],
                   help="dotted config overrides: key value [key value ...]")
    return p


def serving_mesh(args):
    """Resolve --data_parallel/--tensor_parallel into a ('data', 'model')
    mesh, or None for the plain single-device path. dp×tp chips total:
    batch rows spread over 'data', ViT block weights over 'model'."""
    dp = getattr(args, "data_parallel", 0) or 0
    tp = getattr(args, "tensor_parallel", 0) or 0
    if not dp and not tp:
        return None
    import jax

    from whmr_tpu.parallel import make_mesh

    need = max(dp, 1) * max(tp, 1)
    have = len(jax.devices())
    if need > have:
        raise SystemExit(
            f"--data_parallel {dp} x --tensor_parallel {tp} needs {need} "
            f"devices, but only {have} are present"
        )
    return make_mesh(need, model_parallel=max(tp, 1))


def build_pipeline(args):
    """Model + DemoPipeline construction shared by whmr-demo and whmr-video.

    `args` needs: misc, data_dir, checkpoint, max_people, no_camcalib."""
    from whmr_tpu.config import config_from_args
    from whmr_tpu.data.assets import get_assets
    from whmr_tpu.inference.pipeline import DemoPipeline

    cfg = config_from_args(args)
    assets = get_assets(args.data_dir)
    if getattr(args, "bundle", None):
        # frozen AOT artifact: no model build, no checkpoint restore —
        # and none of the model-stack imports below (lean serving path)
        if args.checkpoint:
            raise SystemExit(
                "--bundle already carries its weights; drop --checkpoint "
                "(or drop --bundle to run the live model)"
            )
        if getattr(args, "data_parallel", 0) or getattr(args, "tensor_parallel", 0):
            raise SystemExit(
                "--data_parallel/--tensor_parallel need the live model "
                "(--checkpoint): an exported bundle is traced for a "
                "single device"
            )
        if getattr(args, "dtype", "fp32") != "fp32":
            raise SystemExit(
                "--dtype applies to the live model; a bundle's compute "
                "dtype (bf16) was fixed at export time"
            )
        return DemoPipeline(
            cfg, None, assets,
            max_people=args.max_people,
            use_camcalib=not args.no_camcalib,
            bundle=args.bundle,
        )

    import jax
    import jax.numpy as jnp
    import numpy as np

    from whmr_tpu.models.regressor import body_consts_from_assets
    from whmr_tpu.models.whmr import WHMR
    from whmr_tpu.training.train_step import create_train_state
    from whmr_tpu.utils.checkpoint import CheckpointManager
    from whmr_tpu.utils.testing import make_example_inputs

    consts = body_consts_from_assets(assets)
    model = WHMR(cfg)
    example = make_example_inputs(cfg, 2)
    state = create_train_state(
        cfg, model, consts, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in example.items()},
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if args.checkpoint:
        ckpt = CheckpointManager(args.checkpoint)
        # accepts full-training AND weights-only payloads (the EMA dir
        # checkpoints_ema, whmr-convert output)
        variables = ckpt.restore_weights({
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.zeros((), np.int32),
            "epoch": 0,
            "batch_idx": 0,
        })
        if variables is None:
            raise SystemExit(f"no checkpoint in {args.checkpoint}")

    mesh = serving_mesh(args)

    return DemoPipeline(
        cfg, variables, assets,
        max_people=args.max_people,
        use_camcalib=not args.no_camcalib,
        dtype=jnp.bfloat16 if getattr(args, "dtype", "fp32") == "bf16" else None,
        mesh=mesh,
    )


def detector_kind(args) -> str:
    """Resolve the detector choice (shared by whmr-demo and whmr-video).

    The IUV-proposal detector runs the live model's dense-IUV head as a
    separate jitted pass, which a frozen bundle cannot serve — so bundle
    mode defaults to `full` and rejects an explicit `--detector iuv`."""
    bundle = getattr(args, "bundle", None)
    kind = args.detector or (
        "iuv" if (args.checkpoint and not bundle) else "full"
    )
    if bundle and kind == "iuv":
        raise SystemExit(
            "--detector iuv needs the live model (a separate dense-IUV "
            "fg-mask pass); with --bundle use contour, full, or file"
        )
    return kind


def main(argv=None):
    args = build_parser().parse_args(argv)

    from whmr_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    from whmr_tpu.inference.detector import build_detector

    kind = detector_kind(args)
    pipeline = build_pipeline(args)
    pipeline.detector = build_detector(kind, args.bbox_file, pipeline=pipeline)
    stats = pipeline.run_folder(
        args.image_folder, args.output_folder,
        render=not args.no_render, save_obj_files=args.save_obj,
    )
    print(
        f"W-HMR demo: {stats['images']} images, {stats['people']} people, "
        f"{stats['fps']:.2f} img/s -> results in {args.output_folder}"
    )


if __name__ == "__main__":
    main()
