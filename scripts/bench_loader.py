"""Host data-loader throughput: can the CPU feed the TPU train step?

The aux-on B=64 train step consumes 470 crops/s on one v5e chip
(BASELINE.md round 3). The loader runs the full reference augmentation
pipeline (decode + affine crop + flip/rot/scale/noise + keypoint
transforms) in numpy/cv2 worker THREADS (data/loader.py) — this bench
measures delivered crops/s over a synthetic reference-schema npz dataset
so loader-vs-step headroom is a recorded number, not an assumption.

Usage: python scripts/bench_loader.py [n_images] [batch] [workers ...]
Prefix a worker count with 'p' for fork-based process workers
(e.g. `bench_loader.py 512 64 8 p8` compares 8 threads vs 8 processes).
"""

import json
import os
import sys
import tempfile
import time

import numpy as np


def make_dataset(root: str, n: int, img_hw=(480, 640)) -> None:
    import cv2

    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(3)
    names = []
    for i in range(n):
        img = rng.randint(0, 255, (*img_hw, 3), np.uint8)
        name = f"im_{i:04d}.jpg"
        cv2.imwrite(os.path.join(img_dir, name), img)
        names.append(name)
    np.savez(
        os.path.join(root, "labels.npz"),
        imgname=np.array(names),
        center=rng.uniform(200, 400, (n, 2)).astype(np.float32),
        scale=rng.uniform(0.8, 1.5, (n,)).astype(np.float32),
        pose=(rng.randn(n, 72) * 0.2).astype(np.float32),
        shape=(rng.randn(n, 10) * 0.3).astype(np.float32),
        has_smpl=np.ones(n, np.float32),
        S=np.concatenate(
            [rng.randn(n, 24, 3) * 0.3, np.ones((n, 24, 1))], -1
        ).astype(np.float32),
        part=np.concatenate(
            [rng.uniform(100, 500, (n, 24, 2)), np.ones((n, 24, 1))], -1
        ).astype(np.float32),
        openpose=np.zeros((n, 25, 3), np.float32),
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    worker_specs = sys.argv[3:] or ["1", "4", "8", "16"]

    from whmr_tpu.config import WHMRConfig
    from whmr_tpu.data.loader import BatchLoader
    from whmr_tpu.data.npz_dataset import NpzDataset

    with tempfile.TemporaryDirectory() as root:
        make_dataset(root, n)
        cfg = WHMRConfig()
        ds = NpzDataset(
            cfg,
            os.path.join(root, "labels.npz"),
            os.path.join(root, "imgs"),
            is_train=True,
        )
        for spec in worker_specs:
            procs = spec.startswith("p")
            workers = int(spec.lstrip("p"))
            loader = BatchLoader(
                ds, batch_size=batch, shuffle=True,
                num_workers=0 if procs else workers,
                num_procs=workers if procs else 0,
                drop_last=True,
            )
            loader.set_epoch(0)
            # warm one epoch (page cache for the jpgs), measure the second
            for _ in loader:
                pass
            loader.set_epoch(1)
            t0 = time.perf_counter()
            n_crops = 0
            for b in loader:
                n_crops += b["img"].shape[0]
            dt = time.perf_counter() - t0
            print(json.dumps({
                "metric": f"loader_crops_per_sec_{spec if procs else 'w' + spec}",
                "value": round(n_crops / dt, 1), "unit": "crops/s",
                "batch": batch, "n": n_crops,
            }))


if __name__ == "__main__":
    main()
