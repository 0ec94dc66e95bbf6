"""Build a small fixed synthetic dataset for the overfit regression run.

The round-4 "does the framework LEARN" proof (VERDICT r3 item 1): N samples
with IMAGES THAT DEPICT THE GT BODY — the posed SMPL mesh rendered onto a
textured background with a consistent full-image camera — plus GT-projected
keypoints (the bench-batch caution in CLAUDE.md: random keypoints make the
GT-LSQ camera degenerate). Trained on repeatedly, total loss must collapse
~10x and train-set PA-MPJPE must fall toward zero (the reference's de-facto
regression test is metric improvement over training, core/trainer.py:753-907).

Conventions kept consistent so every loss term is learnable:
- full-image focal = sqrt(W^2 + H^2) = the dataset pseudo-focal
  (reference base_dataset.py:368), so the focal-supervision target equals
  the true render camera; at 480x360 that is exactly 600 px.
- `part` = the 24 GT-convention joints (rows 25:49 of the pare 49-joint
  layout) projected through the render camera, conf 1.
- `S` = the same 24 joints in camera-frame meters, conf 1.
- center/scale from the projected-keypoint bbox (SPIN convention h/200).

Usage: python scripts/make_overfit_dataset.py OUT_DIR [--n 256] [--seed 0]
Writes OUT_DIR/images/*.png and OUT_DIR/labels.npz.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--height", type=int, default=360)
    args = ap.parse_args(argv)

    import jax

    # Generation is pure host work; never claim the TPU for it.
    jax.config.update("jax_platforms", "cpu")

    import cv2
    import jax.numpy as jnp
    import numpy as np

    from whmr_tpu.data.assets import synthetic_smpl_assets
    from whmr_tpu.inference.renderer import render_overlay
    from whmr_tpu.models.smpl import smpl_forward, smpl_params_from_assets
    from whmr_tpu.ops.rotation import batch_rodrigues

    w, h = args.width, args.height
    focal = float(np.sqrt(w * w + h * h))
    rng = np.random.RandomState(args.seed)
    n = args.n

    assets = synthetic_smpl_assets()
    smpl_c = smpl_params_from_assets(assets)
    faces = np.asarray(assets.faces, np.int32)

    # GT params: moderate pose noise (axis-angle), moderate shapes.
    pose = (rng.randn(n, 72) * 0.25).astype(np.float32)
    pose[:, :3] = rng.randn(n, 3) * 0.4  # a bit more global-orient variety
    betas = (rng.randn(n, 10) * 0.5).astype(np.float32)

    @jax.jit
    def fwd(c, pose, betas):
        rm = batch_rodrigues(pose.reshape(-1, 3)).reshape(-1, 24, 3, 3)
        out = smpl_forward(c, betas, rm)
        return out.vertices, out.joints

    verts, joints = (
        np.asarray(a) for a in fwd(smpl_c, jnp.asarray(pose), jnp.asarray(betas))
    )

    # Camera: depth so the body spans a plausible crop, small xy offsets.
    tz = rng.uniform(4.5, 8.0, (n, 1))
    txy = rng.uniform(-0.25, 0.25, (n, 2))
    cam_t = np.concatenate([txy, tz], axis=1).astype(np.float32)

    gt24 = joints[:, 25:49]  # GT-convention joints (pare layout rows 25:49)
    pj = gt24 + cam_t[:, None, :]
    pix = focal * pj[..., :2] / pj[..., 2:3] + np.array([w / 2.0, h / 2.0])
    part = np.concatenate([pix, np.ones((n, 24, 1))], axis=-1).astype(np.float32)

    lo = pix.min(axis=1)
    hi = pix.max(axis=1)
    center = ((lo + hi) / 2.0).astype(np.float32)
    scale = (1.1 * (hi - lo).max(axis=1) / 200.0).astype(np.float32)

    S = np.concatenate([gt24, np.ones((n, 24, 1))], axis=-1).astype(np.float32)

    img_dir = os.path.join(args.out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    names = []
    for i in range(n):
        # Smooth per-sample background so samples are distinguishable even
        # where the body doesn't reach.
        small = rng.randint(40, 215, (6, 8, 3), np.uint8)
        bg = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
        img = render_overlay(
            bg, [verts[i]], [cam_t[i]], faces, [focal],
            color=(0.65, 0.74, 0.86, 1.0),
        )
        name = f"ov_{i:04d}.png"
        cv2.imwrite(os.path.join(img_dir, name), img[..., ::-1])  # RGB->BGR
        names.append(name)
        if (i + 1) % 64 == 0:
            print(f"rendered {i + 1}/{n}", flush=True)

    np.savez(
        os.path.join(args.out_dir, "labels.npz"),
        imgname=np.array(names),
        center=center,
        scale=scale,
        pose=pose,
        shape=betas,
        has_smpl=np.ones(n, np.float32),
        S=S,
        part=part,
        openpose=np.zeros((n, 25, 3), np.float32),
    )
    print(f"wrote {args.out_dir}/labels.npz ({n} samples, focal {focal:.0f})")


if __name__ == "__main__":
    sys.exit(main())
