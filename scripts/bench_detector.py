"""Detector quality bench: recall/precision/mean-IoU on composited frames.

VERDICT r3 item 5: quantify the in-repo detector backends
(ContourPersonDetector, IUVProposalDetector) against GT boxes — the
reference's demo quality rests on an external YOLOv3 whose recall it
never measures (tester.py:68-79); here the number is part of the repo.

Usage: python scripts/bench_detector.py [--frames N] [--people K]
           [--checkpoint CKPT_DIR]   # adds the IUV-proposal backend
Runs on CPU (detection is a host/graph-light path); the IUV backend
jits its mask graph on whatever platform is default.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--people", type=int, default=2)
    ap.add_argument("--checkpoint", default=None,
                    help="orbax dir: also score IUVProposalDetector")
    ap.add_argument("--cpu", action="store_true", help="force CPU jax")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from whmr_tpu.inference.detector import ContourPersonDetector
    from whmr_tpu.inference.detector_eval import composite_frames, score_detector

    for people in sorted({1, args.people}):
        frames, gt = composite_frames(args.frames, people_per_frame=people)
        s = score_detector(ContourPersonDetector(), frames, gt)
        print(json.dumps({
            "metric": f"detector_contour_p{people}",
            **{k: round(v, 4) for k, v in s.items()},
        }))

        if args.checkpoint:
            import types

            from whmr_tpu.config import WHMRConfig
            from whmr_tpu.inference.detector import IUVProposalDetector
            from whmr_tpu.inference.eval_cli import load_model_state

            cfg = WHMRConfig()
            # one definition of build-model+restore (the third copy of this
            # block drifted once already — see round-5 review)
            model, variables, _consts, _assets = load_model_state(
                types.SimpleNamespace(
                    checkpoint=args.checkpoint, data_dir=None,
                    regressor="pymaf_net",
                ),
                cfg,
            )
            det = IUVProposalDetector(cfg, model, variables)
            s = score_detector(det, frames, gt)
            print(json.dumps({
                "metric": f"detector_iuv_p{people}",
                **{k: round(v, 4) for k, v in s.items()},
            }))


if __name__ == "__main__":
    main()
