"""Shared fixtures: tiny configs and synthetic batches for tests/benchmarks."""

from __future__ import annotations

from dataclasses import replace
from typing import Dict, Optional, Tuple

import numpy as np

from whmr_tpu.config import DeconvConfig, PyMAFConfig, ViTConfig, WHMRConfig


def tiny_config(backbone: str = "vitpose") -> WHMRConfig:
    """A dimension-consistent miniature WHMR config for fast CPU tests."""
    cfg = WHMRConfig()
    return replace(
        cfg,
        pymaf=replace(cfg.pymaf, backbone=backbone, mlp_dim=(32, 16, 8, 4)),
        deconv=DeconvConfig(num_filters=(32, 32, 32)),
        vit=ViTConfig(embed_dim=64, depth=2, num_heads=2, drop_path_rate=0.0),
    )


def make_example_inputs(
    cfg: WHMRConfig,
    batch: int,
    seed: int = 0,
    with_full_img: bool = False,
    dtype=np.float32,
) -> Dict[str, np.ndarray]:
    """Random inputs with realistic ranges for the WHMR forward signature."""
    rng = np.random.RandomState(seed)
    h, w = cfg.crop_hw
    img_h, img_w = 720.0, 1280.0
    bbox_height = rng.uniform(150, 500, size=(batch,)).astype(dtype)
    center = np.stack(
        [rng.uniform(200, 1080, batch), rng.uniform(150, 570, batch)], axis=-1
    ).astype(dtype)
    focal = np.sqrt(img_h**2 + img_w**2).astype(dtype)
    # bbox_info: [cx-img_cx, cy-img_cy, bbox_h, img_w, img_h] / pseudo-focal
    # (reference datasets/base_dataset.py:368-373, demo/tester.py:127-145).
    bbox_info = (
        np.stack(
            [
                center[:, 0] - img_w / 2,
                center[:, 1] - img_h / 2,
                bbox_height,
                np.full(batch, img_w),
                np.full(batch, img_h),
            ],
            axis=-1,
        )
        / focal
    ).astype(dtype)
    out = {
        "x": rng.randn(batch, h, w, 3).astype(dtype),
        "center": center,
        "scale": (bbox_height / 200.0).astype(dtype),
        "bbox_height": bbox_height,
        "orig_shape": np.tile(np.array([[img_h, img_w]], dtype), (batch, 1)),
        "bbox_info": bbox_info,
    }
    if with_full_img:
        ch, cw = cfg.cam_img_size
        out["full_x"] = rng.randn(batch, ch, cw, 3).astype(dtype)
    return out


def make_example_train_batch(
    cfg: WHMRConfig, batch: int, seed: int = 0, dtype=np.float32
) -> Dict[str, np.ndarray]:
    """Synthetic training batch with all GT fields the loss consumes
    (field inventory per reference datasets/base_dataset.py:249-384)."""
    rng = np.random.RandomState(seed)
    inputs = make_example_inputs(cfg, batch, seed=seed, dtype=dtype)
    out = {
        "img": inputs["x"],
        "center": inputs["center"],
        "scale": inputs["scale"],
        "bbox_height": inputs["bbox_height"],
        "bbox_width": inputs["bbox_height"] * 0.75,
        "orig_shape": inputs["orig_shape"],
        "bbox_info": inputs["bbox_info"],
        "keypoints": np.concatenate(
            [rng.uniform(-1, 1, (batch, 49, 2)), np.ones((batch, 49, 1))], -1
        ).astype(dtype),
        "keypoints_world": np.concatenate(
            [rng.uniform(-1, 1, (batch, 49, 2)), np.ones((batch, 49, 1))], -1
        ).astype(dtype),
        "pose": (rng.randn(batch, 72) * 0.2).astype(dtype),
        "betas": (rng.randn(batch, 10) * 0.5).astype(dtype),
        "pose_3d": np.concatenate(
            [rng.randn(batch, 24, 3) * 0.3, np.ones((batch, 24, 1))], -1
        ).astype(dtype),
        "has_smpl": np.ones(batch, dtype),
        "has_pose_3d": np.ones(batch, dtype),
        "focal": np.full(batch, 1469.0, dtype),
        # 431-vertex BERT-style visibility mask (base_dataset.py:345-355)
        "meta_mask": (rng.random_sample((batch, 431, 1)) > 0.15).astype(dtype),
    }
    return out
