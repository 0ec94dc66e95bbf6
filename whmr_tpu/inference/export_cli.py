"""`whmr-export` CLI: checkpoint -> portable AOT serving bundle.

Net-new capability (the reference deploys by loading its torch codebase,
demo/tester.py:55-66). The bundle (StableHLO graph + weights.npz +
meta.json) is restored by `whmr_tpu.inference.export.load_exported` — or
by any process with jax + numpy, no model code.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Export a WHMR checkpoint to an AOT serving bundle"
    )
    p.add_argument("--checkpoint", required=True, help="orbax checkpoint dir")
    p.add_argument("--output", required=True, help="bundle output directory")
    p.add_argument("--batch_size", type=int, default=48,
                   help="fixed serving batch (48 is the v5e throughput "
                        "optimum, BASELINE.md); 0 exports a "
                        "batch-POLYMORPHIC artifact (any batch size, "
                        "compiled per shape at first use)")
    p.add_argument("--camcalib", nargs="?", const="batch", default=None,
                   choices=("batch", "split"),
                   help="include the CamCalib branch (demo graph, "
                        "tester.py:100-104). 'batch' (the bare-flag "
                        "default) traces the full frame into the main "
                        "graph — one frame per batch, no cross-frame "
                        "coalescing; 'split' exports a SECOND per-frame "
                        "CamCalib graph and the main graph takes per-crop "
                        "cam_rotmat, so whmr-serve coalesces crops from "
                        "different frames (one calibration per unique "
                        "frame, content-hash cached)")
    p.add_argument("--eval", action="store_true", dest="eval_variant",
                   help="export the EVAL graph instead of the demo one: "
                        "GT cam_rotmat input, normalized fp32 crops, "
                        "metric-protocol outputs — consumed by "
                        "whmr-eval --bundle (reference protocol "
                        "eval.py:155-228)")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering platforms")
    p.add_argument("--bf16", action="store_true",
                   help="trace with bfloat16 compute (the TPU serving "
                        "default used by bench.py)")
    p.add_argument("--check", action="store_true",
                   help="reload the bundle and run one batch through it")
    p.add_argument("--data_dir", default=None, help="asset dir")
    p.add_argument("--cfg_file", default=None,
                   help="reference-style YAML config — REQUIRED to match the "
                        "checkpoint's geometry when it was trained with one "
                        "(e.g. configs/vit-l.yaml)")
    p.add_argument("--misc", nargs="*", default=[],
                   help="dotted config overrides: key value [key value ...]")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from whmr_tpu.config import config_from_args
    from whmr_tpu.inference.eval_cli import load_model_state
    from whmr_tpu.inference.export import (
        export_camcalib,
        export_serving,
        load_exported,
        save_exported,
    )
    from whmr_tpu.models.whmr import WHMR

    cfg = config_from_args(args)
    model, variables, consts, _assets = load_model_state(args, cfg)
    if args.bf16:
        model = WHMR(cfg, dtype=jnp.bfloat16)

    variant = "eval" if args.eval_variant else "demo"
    if args.eval_variant and args.camcalib:
        raise SystemExit(
            "--eval and --camcalib are mutually exclusive: the eval "
            "protocol feeds the GT cam_rotmat (eval.py:157-163), not the "
            "CamCalib branch"
        )
    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    exp, flat = export_serving(
        cfg, model, variables, consts, args.batch_size,
        camcalib=args.camcalib, platforms=platforms, variant=variant,
    )
    cam_exp = (
        export_camcalib(cfg, model, variables, consts, platforms=platforms)
        if args.camcalib == "split" else None
    )
    save_exported(args.output, exp, flat, cfg, args.batch_size, args.camcalib,
                  variant=variant, cam_exp=cam_exp)
    import os

    size_mb = sum(
        os.path.getsize(os.path.join(args.output, f))
        for f in os.listdir(args.output)
    ) / 1e6
    print(f"[export] bundle written to {args.output} "
          f"({size_mb:.1f} MB, platforms={','.join(platforms)}, "
          f"batch={args.batch_size}, camcalib={args.camcalib}, "
          f"variant={variant})")

    if args.check:
        from whmr_tpu.utils.testing import make_example_inputs

        served = load_exported(args.output)
        h, w = cfg.crop_hw
        rng = np.random.RandomState(0)
        b = args.batch_size or 4
        inp = make_example_inputs(cfg, b)
        common = dict(
            center=np.asarray(inp["center"]),
            scale=np.asarray(inp["scale"]),
            bbox_height=np.asarray(inp["bbox_height"]),
            orig_shape=np.asarray(inp["orig_shape"]),
            bbox_info=np.asarray(inp["bbox_info"]),
        )
        if args.eval_variant:
            eye = np.broadcast_to(np.eye(3, dtype=np.float32), (b, 3, 3))
            out = served.call_eval(
                img=rng.randn(b, h, w, 3).astype(np.float32),
                cam_rotmat=np.ascontiguousarray(eye), **common,
            )
        else:
            call_args = dict(
                x_u8=rng.randint(0, 255, (b, h, w, 3), np.uint8), **common,
            )
            if args.camcalib:
                ch, cw = cfg.cam_img_size
                # both modes accept the frame: 'batch' feeds it to the
                # main graph, 'split' routes it through camcalib_fn
                call_args["full_u8"] = rng.randint(
                    0, 255, (1, ch, cw, 3), np.uint8
                )
            out = served(**call_args)
        finite = all(bool(np.isfinite(np.asarray(v)).all()) for v in out.values())
        print("[export] check: " + ", ".join(
            f"{k}{tuple(v.shape)}" for k, v in sorted(out.items())
        ))
        print(f"[export] check outputs finite: {finite}")
        if not finite:
            raise SystemExit("exported graph produced non-finite outputs")


if __name__ == "__main__":
    main()
