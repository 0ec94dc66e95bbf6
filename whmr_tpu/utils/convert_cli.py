"""`whmr-convert`: reference torch checkpoint -> orbax checkpoint.

Loads `w-hmr-p-vitpose_checkpoint.pt`-style state_dicts (demo/tester.py:
61-66) with torch-cpu, maps them through utils.convert, merges over a
freshly initialized parameter tree (so constants/new heads keep their
init), and writes an orbax checkpoint the eval/demo CLIs can consume.
"""

from __future__ import annotations

import argparse


def merge_trees(base: dict, update: dict, path=""):
    """Recursively merge converted params over the initialized tree,
    reporting shape mismatches and unmatched keys."""
    merged = dict(base)
    report = {"matched": 0, "mismatched": [], "extra": []}
    for k, v in update.items():
        if k not in base:
            report["extra"].append(f"{path}/{k}")
            continue
        if isinstance(v, dict):
            merged[k], sub = merge_trees(base[k], v, f"{path}/{k}")
            report["matched"] += sub["matched"]
            report["mismatched"] += sub["mismatched"]
            report["extra"] += sub["extra"]
        else:
            if tuple(getattr(base[k], "shape", ())) != tuple(v.shape):
                report["mismatched"].append(
                    f"{path}/{k}: ckpt {tuple(v.shape)} vs model {tuple(getattr(base[k], 'shape', ()))}"
                )
            else:
                merged[k] = v
                report["matched"] += 1
    return merged, report


def main(argv=None):
    p = argparse.ArgumentParser(description="Convert a reference .pt checkpoint")
    p.add_argument("--torch_ckpt", required=True)
    p.add_argument("--out", required=True, help="orbax checkpoint dir")
    p.add_argument("--state_dict_key", default="model", help="key inside the .pt (or 'none')")
    p.add_argument("--data_dir", default=None, help="asset dir")
    p.add_argument("--strict", action="store_true",
                   help="fail on any mismatched/unmatched/unrecognized key "
                        "(the flax analogue of torch strict=True, tester.py:65)")
    p.add_argument("--misc", nargs="*", default=[],
                   help="dotted config overrides: key value [key value ...]")
    args = p.parse_args(argv)

    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from whmr_tpu.config import WHMRConfig
    from whmr_tpu.data.assets import get_assets
    from whmr_tpu.models.regressor import body_consts_from_assets
    from whmr_tpu.models.whmr import WHMR
    from whmr_tpu.training.train_step import create_train_state
    from whmr_tpu.utils.checkpoint import CheckpointManager
    from whmr_tpu.utils.convert import convert_whmr_checkpoint
    from whmr_tpu.utils.testing import make_example_inputs

    ckpt = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    sd = ckpt if args.state_dict_key == "none" else ckpt.get(args.state_dict_key, ckpt)
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    converted, report = convert_whmr_checkpoint(sd, return_report=True)
    if report["unrecognized"]:
        print(f"unrecognized ckpt keys ({len(report['unrecognized'])}):")
        for k in sorted(report["unrecognized"])[:20]:
            print("  ", k)

    cfg = WHMRConfig()
    if args.misc:
        cfg = cfg.with_overrides(**dict(zip(args.misc[::2], args.misc[1::2])))
    consts = body_consts_from_assets(get_assets(args.data_dir))
    model = WHMR(cfg)
    example = make_example_inputs(cfg, 2)
    state = create_train_state(
        cfg, model, consts, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in example.items()},
    )
    params, rep_p = merge_trees(
        jax.tree.map(np.asarray, dict(state.params)), converted["params"]
    )
    stats, rep_s = merge_trees(
        jax.tree.map(np.asarray, dict(state.batch_stats)), converted["batch_stats"]
    )
    print(
        f"matched params: {rep_p['matched']} (+{rep_s['matched']} batch stats); "
        f"mismatched: {len(rep_p['mismatched'])}; unmatched ckpt keys: {len(rep_p['extra'])}"
    )
    for m in (rep_p["mismatched"] + rep_s["mismatched"])[:20]:
        print("  MISMATCH", m)
    problems = (
        len(rep_p["mismatched"]) + len(rep_s["mismatched"])
        + len(rep_p["extra"]) + len(rep_s["extra"])
        + len(report["unrecognized"])
    )
    if args.strict and problems:
        raise SystemExit(f"--strict: {problems} conversion problems (see above)")

    mgr = CheckpointManager(args.out)
    mgr.save(
        0,
        {
            "params": params,
            "batch_stats": stats,
            "opt_state": jax.tree.map(
                lambda x: np.asarray(x) if hasattr(x, "shape") else x,
                state.opt_state,
            ),
            "step": np.zeros((), np.int32),
            "epoch": 0,
            "batch_idx": 0,
        },
    )
    print(f"wrote orbax checkpoint to {args.out}")


if __name__ == "__main__":
    main()
