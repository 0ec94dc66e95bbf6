"""`whmr-eval` CLI (reference evaluate/eval.py:44-62, 364-385 surface)."""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Evaluate a WHMR checkpoint")
    p.add_argument("--checkpoint", required=True, help="orbax checkpoint dir")
    p.add_argument("--dataset_npz", required=True, help="eval label npz")
    p.add_argument("--img_dir", required=True)
    p.add_argument("--data_dir", default=None, help="asset dir")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--log_freq", type=int, default=10)
    p.add_argument("--misc", nargs="*", default=[],
                   help="dotted config overrides: key value [key value ...]")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from whmr_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from whmr_tpu.config import WHMRConfig
    from whmr_tpu.data.assets import get_assets
    from whmr_tpu.data.loader import BatchLoader
    from whmr_tpu.data.npz_dataset import NpzDataset
    from whmr_tpu.inference.evaluate import run_evaluation
    from whmr_tpu.models.regressor import body_consts_from_assets
    from whmr_tpu.models.whmr import WHMR
    from whmr_tpu.training.train_step import create_train_state
    from whmr_tpu.utils.checkpoint import CheckpointManager
    from whmr_tpu.utils.testing import make_example_inputs

    cfg = WHMRConfig()
    if args.misc:
        cfg = cfg.with_overrides(**dict(zip(args.misc[::2], args.misc[1::2])))
    assets = get_assets(args.data_dir)
    consts = body_consts_from_assets(assets)
    model = WHMR(cfg)

    example = make_example_inputs(cfg, 2)
    state = create_train_state(
        cfg, model, consts, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in example.items()},
    )
    ckpt = CheckpointManager(args.checkpoint)
    payload = ckpt.restore(
        template={
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.zeros((), np.int32),
            "epoch": 0,
        }
    )
    if payload is None:
        raise SystemExit(f"no checkpoint found in {args.checkpoint}")
    variables = {"params": payload["params"], "batch_stats": payload["batch_stats"]}

    ds = NpzDataset(cfg, args.dataset_npz, args.img_dir, is_train=False)
    loader = BatchLoader(ds, args.batch_size, shuffle=False, drop_last=False)

    def batches():
        for host_batch in loader:
            b = {k: jnp.asarray(v) for k, v in host_batch.items()
                 if k in ("img", "center", "scale", "bbox_height", "orig_shape",
                          "bbox_info", "pose", "betas")}
            b["valid"] = jnp.asarray(host_batch["has_smpl"])
            n = b["img"].shape[0]
            b["cam_rotmat"] = jnp.broadcast_to(jnp.eye(3), (n, 3, 3))
            yield b

    result = run_evaluation(cfg, model, variables, consts, batches(), log_every=args.log_freq)
    print(
        f"*** Final Results ***\nPVE: {result['pve']:.2f}\n"
        f"MPJPE: {result['mpjpe']:.2f}\nPA-MPJPE (Reconstruction Error): {result['pa_mpjpe']:.2f}"
    )


if __name__ == "__main__":
    main()
