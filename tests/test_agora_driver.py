"""AGORA submission driver test: det-score gate -> model -> pkl tree
(reference evaluate/val_results.py:40-157)."""

import os
import pickle

import cv2
import numpy as np
import pytest

from whmr_tpu.utils.testing import tiny_config


@pytest.fixture(scope="module")
def agora_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("agora")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(1)
    # 3 crops: two persons of frame A (one gated out by det score), one of B
    names = ["frameA_5214_1280x720.png", "frameA_5214_1280x720.png",
             "frameB_0007_1280x720.png"]
    for name in set(names):
        cv2.imwrite(str(img_dir / name), rng.randint(0, 255, (720, 1280, 3), np.uint8))
    n = len(names)
    np.savez(
        root / "labels.npz",
        imgname=np.array(names),
        center=rng.uniform(300, 900, (n, 2)).astype(np.float32),
        scale=np.full((n,), 1.2, np.float32),
        det_score=np.array([0.9, 0.5, 0.8], np.float32),
    )
    return root


class TestAgoraDriver:
    def test_pkl_tree_layout(self, agora_setup, tmp_path):
        import jax
        import jax.numpy as jnp

        from whmr_tpu.data.assets import synthetic_smpl_assets
        from whmr_tpu.data.npz_dataset import NpzDataset
        from whmr_tpu.inference.agora import run_agora_submission
        from whmr_tpu.models.regressor import body_consts_from_assets
        from whmr_tpu.models.whmr import WHMR
        from whmr_tpu.training.train_step import create_train_state
        from whmr_tpu.utils.testing import make_example_inputs

        cfg = tiny_config()
        consts = body_consts_from_assets(synthetic_smpl_assets())
        model = WHMR(cfg)
        inputs = make_example_inputs(cfg, 2)
        state = create_train_state(
            cfg, model, consts, jax.random.PRNGKey(0),
            {k: jnp.asarray(v) for k, v in inputs.items()},
        )
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        ds = NpzDataset(
            cfg, str(agora_setup / "labels.npz"), str(agora_setup / "images"),
            is_train=False,
        )
        out_dir = str(tmp_path / "results")
        stats = run_agora_submission(
            cfg, model, variables, consts, ds, out_dir,
            mode="val", batch_size=2, make_zip=True, log_every=0,
        )
        assert stats == {"written": 2, "skipped": 1, "images": 2}
        files = sorted(os.listdir(out_dir))
        # val mode drops the resolution component of the stem
        assert files == [
            "frameA_5214_personId_1.pkl",
            "frameB_0007_personId_1.pkl",
        ]
        with open(os.path.join(out_dir, files[0]), "rb") as f:
            payload = pickle.load(f)
        assert payload["joints"].shape == (24, 2)
        assert payload["verts"].shape[1] == 3
        assert payload["allSmplJoints3d"].shape == (24, 3)
        assert np.isfinite(payload["joints"]).all()
        assert os.path.exists(out_dir + ".zip")
