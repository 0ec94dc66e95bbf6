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
    p.add_argument("--camcalib", action="store_true",
                   help="include the CamCalib full-frame branch "
                        "(demo graph, tester.py:100-104)")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering platforms")
    p.add_argument("--bf16", action="store_true",
                   help="trace with bfloat16 compute (the TPU serving "
                        "default used by bench.py)")
    p.add_argument("--check", action="store_true",
                   help="reload the bundle and run one batch through it")
    p.add_argument("--data_dir", default=None, help="asset dir")
    p.add_argument("--misc", nargs="*", default=[],
                   help="dotted config overrides: key value [key value ...]")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from whmr_tpu.config import WHMRConfig
    from whmr_tpu.inference.eval_cli import load_model_state
    from whmr_tpu.inference.export import (
        export_serving,
        load_exported,
        save_exported,
    )
    from whmr_tpu.models.whmr import WHMR

    cfg = WHMRConfig()
    if args.misc:
        cfg = cfg.with_overrides(**dict(zip(args.misc[::2], args.misc[1::2])))
    model, variables, consts, _assets = load_model_state(args, cfg)
    if args.bf16:
        model = WHMR(cfg, dtype=jnp.bfloat16)

    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    exp, flat = export_serving(
        cfg, model, variables, consts, args.batch_size,
        camcalib=args.camcalib, platforms=platforms,
    )
    save_exported(args.output, exp, flat, cfg, args.batch_size, args.camcalib)
    import os

    size_mb = sum(
        os.path.getsize(os.path.join(args.output, f))
        for f in os.listdir(args.output)
    ) / 1e6
    print(f"[export] bundle written to {args.output} "
          f"({size_mb:.1f} MB, platforms={','.join(platforms)}, "
          f"batch={args.batch_size}, camcalib={args.camcalib})")

    if args.check:
        served = load_exported(args.output)
        h, w = cfg.crop_hw
        rng = np.random.RandomState(0)
        b = args.batch_size or 4
        img_h, img_w = 720.0, 1280.0
        bbox_height = rng.uniform(150, 500, b).astype(np.float32)
        center = np.stack(
            [rng.uniform(200, 1080, b), rng.uniform(150, 570, b)], -1
        ).astype(np.float32)
        focal = np.float32(np.sqrt(img_h**2 + img_w**2))
        bbox_info = (np.stack(
            [center[:, 0] - img_w / 2, center[:, 1] - img_h / 2, bbox_height,
             np.full(b, img_w), np.full(b, img_h)], -1,
        ) / focal).astype(np.float32)
        call_args = dict(
            x_u8=rng.randint(0, 255, (b, h, w, 3), np.uint8),
            center=center,
            scale=(bbox_height / 200.0).astype(np.float32),
            bbox_height=bbox_height,
            orig_shape=np.tile([img_h, img_w], (b, 1)).astype(np.float32),
            bbox_info=bbox_info,
        )
        if args.camcalib:
            ch, cw = cfg.cam_img_size
            call_args["full_u8"] = rng.randint(0, 255, (1, ch, cw, 3), np.uint8)
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
