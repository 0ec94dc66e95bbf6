"""AOT serving export tests (whmr_tpu/inference/export.py).

The reference has no serving-export counterpart (deployment = load the
torch codebase, demo/tester.py:55-66); the bundle format is net-new, so
these tests gate (a) save/load round trip fidelity against the live
model, (b) multi-platform lowering, (c) the camcalib demo-graph variant.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whmr_tpu.data.assets import synthetic_smpl_assets
from whmr_tpu.inference.export import (
    OUTPUT_KEYS,
    export_serving,
    load_exported,
    save_exported,
)
from whmr_tpu.models.regressor import body_consts_from_assets
from whmr_tpu.models.whmr import WHMR
from whmr_tpu.training.train_step import create_train_state
from whmr_tpu.utils.testing import make_example_inputs, tiny_config

from whmr_tpu.config import IMG_NORM_MEAN, IMG_NORM_STD


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    consts = body_consts_from_assets(synthetic_smpl_assets())
    model = WHMR(cfg)
    inputs = make_example_inputs(cfg, 2)
    state = create_train_state(
        cfg, model, consts, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in inputs.items()},
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return cfg, model, variables, consts, inputs


def _call_args(cfg, inputs, seed=0):
    h, w = cfg.crop_hw
    rng = np.random.RandomState(seed)
    return dict(
        x_u8=rng.randint(0, 255, (2, h, w, 3), np.uint8),
        center=np.asarray(inputs["center"]),
        scale=np.asarray(inputs["scale"]),
        bbox_height=np.asarray(inputs["bbox_height"]),
        orig_shape=np.asarray(inputs["orig_shape"]),
        bbox_info=np.asarray(inputs["bbox_info"]),
    )


class TestExport:
    def test_round_trip_matches_live_model(self, setup, tmp_path):
        """save -> load -> call reproduces the live jitted forward exactly
        (same platform, identical graph up to serialization)."""
        cfg, model, variables, consts, inputs = setup
        exp, flat = export_serving(
            cfg, model, variables, consts, 2, camcalib=False,
            platforms=("cpu",),
        )
        out_dir = str(tmp_path / "bundle")
        save_exported(out_dir, exp, flat, cfg, 2, False)
        served = load_exported(out_dir)
        args = _call_args(cfg, inputs)
        got = served(**args)
        assert set(got) == set(OUTPUT_KEYS)

        # live reference: identical normalization + forward
        mean = jnp.asarray(IMG_NORM_MEAN, jnp.float32)
        std = jnp.asarray(IMG_NORM_STD, jnp.float32)
        x = (jnp.asarray(args["x_u8"]).astype(jnp.float32) / 255.0 - mean) / std
        live = jax.jit(
            lambda v, c, *a: model.apply(v, c, *a, train=False)
        )(variables, consts, x, args["center"], args["scale"],
          args["bbox_height"], args["orig_shape"], args["bbox_info"])
        vis = live["vis"]
        np.testing.assert_allclose(
            np.asarray(got["verts"]), np.asarray(vis["local_smpl_vertices"]),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got["verts_world"]), np.asarray(vis["smpl_vertices"]),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got["focal_length"]), np.asarray(vis["focal_length"]),
            rtol=1e-6,
        )

        # meta sanity: signature + dtypes recorded
        meta = json.load(open(os.path.join(out_dir, "meta.json")))
        assert meta["batch_size"] == 2 and meta["camcalib"] is False
        assert meta["n_weights"] == len(flat)
        assert meta["output_keys"] == list(OUTPUT_KEYS)

    def test_multiplatform_lowering_and_camcalib(self, setup, tmp_path):
        """cpu+tpu lowering from a CPU-only process; camcalib variant takes
        the (1, H, W, 3) full frame and produces a non-identity rotation."""
        cfg, model, variables, consts, inputs = setup
        exp, flat = export_serving(
            cfg, model, variables, consts, 2, camcalib=True,
            platforms=("cpu", "tpu"),
        )
        assert set(exp.platforms) == {"cpu", "tpu"}
        out_dir = str(tmp_path / "bundle_cc")
        save_exported(out_dir, exp, flat, cfg, 2, True)
        served = load_exported(out_dir)
        args = _call_args(cfg, inputs)
        with pytest.raises(ValueError):
            served(**args)  # camcalib artifact requires full_u8
        ch, cw = cfg.cam_img_size
        args["full_u8"] = np.random.RandomState(3).randint(
            0, 255, (1, ch, cw, 3), np.uint8
        )
        got = served(**args)
        rot = np.asarray(got["cam_rotmat"])
        assert np.isfinite(rot).all()
        assert not np.allclose(rot[0], np.eye(3), atol=1e-4)

    def test_split_camcalib_bundle_matches_batch_mode(self, setup, tmp_path):
        """`whmr-export --camcalib split` writes TWO graphs: a per-frame
        CamCalib graph (camcalib.jaxexport) and a main graph taking
        per-crop cam_rotmat — the frozen form of the coalesced-serving
        protocol. Outputs must match the batch-mode camcalib bundle on
        the same frame, including the pitch-flipped render_rotmat."""
        from whmr_tpu.inference.export import export_camcalib

        cfg, model, variables, consts, inputs = setup
        ch, cw = cfg.cam_img_size
        full_u8 = np.random.RandomState(3).randint(
            0, 255, (1, ch, cw, 3), np.uint8
        )
        args = _call_args(cfg, inputs)

        exp_b, flat = export_serving(
            cfg, model, variables, consts, 2, camcalib="batch",
            platforms=("cpu",),
        )
        dir_b = str(tmp_path / "bundle_batchcc")
        save_exported(dir_b, exp_b, flat, cfg, 2, "batch")
        ref = load_exported(dir_b)(**args, full_u8=full_u8)

        exp_s, flat = export_serving(
            cfg, model, variables, consts, 2, camcalib="split",
            platforms=("cpu",),
        )
        cam_exp = export_camcalib(cfg, model, variables, consts,
                                  platforms=("cpu",))
        dir_s = str(tmp_path / "bundle_splitcc")
        # split without its cam graph is an invalid artifact
        with pytest.raises(ValueError, match="cam_exp"):
            save_exported(dir_s, exp_s, flat, cfg, 2, "split")
        save_exported(dir_s, exp_s, flat, cfg, 2, "split", cam_exp=cam_exp)
        assert os.path.exists(os.path.join(dir_s, "camcalib.jaxexport"))
        served = load_exported(dir_s)
        assert served.camcalib_mode == "split"

        # convenience path: full frame in, camcalib_fn routes it
        got = served(**args, full_u8=full_u8)
        for k in ("verts", "verts_world", "cam_rotmat", "render_rotmat",
                  "focal_length"):
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(ref[k]), rtol=1e-5, atol=1e-5,
            )
        assert not np.allclose(np.asarray(got["cam_rotmat"])[0], np.eye(3),
                               atol=1e-4)
        # render_rotmat is the pitch-FLIPPED rotation, not the echo
        assert not np.allclose(np.asarray(got["render_rotmat"]),
                               np.asarray(got["cam_rotmat"]), atol=1e-6)

        # explicit per-crop cam_rotmat (the coalesced-serving call shape)
        d = served.camcalib_fn(full_u8)
        cam = np.broadcast_to(np.asarray(d["cam_rotmat"]), (2, 3, 3))
        got2 = served(**args, cam_rotmat=cam.astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(got2["verts"]), np.asarray(ref["verts"]),
            rtol=1e-5, atol=1e-5,
        )
        # neither input -> loud error
        with pytest.raises(ValueError, match="split"):
            served(**args)
        # batch-mode bundles have no camcalib graph
        with pytest.raises(ValueError, match="split"):
            load_exported(dir_b).camcalib_fn(full_u8)

    def test_batch_polymorphic_bundle(self, setup, tmp_path):
        """batch_size=0 exports ONE artifact serving any batch size
        (jax.export symbolic dim), surviving serialization, and matching
        the live model at each concrete size."""
        cfg, model, variables, consts, inputs = setup
        exp, flat = export_serving(
            cfg, model, variables, consts, None, camcalib=False,
            platforms=("cpu",),
        )
        out_dir = str(tmp_path / "bundle_poly")
        save_exported(out_dir, exp, flat, cfg, None, False)
        served = load_exported(out_dir)
        assert served.batch_size is None
        h, w = cfg.crop_hw
        mean = jnp.asarray(IMG_NORM_MEAN, jnp.float32)
        std = jnp.asarray(IMG_NORM_STD, jnp.float32)
        live = jax.jit(lambda v, c, *a: model.apply(v, c, *a, train=False))
        for bs in (2, 5):
            inp = make_example_inputs(cfg, bs, seed=bs)
            x_u8 = np.random.RandomState(bs).randint(
                0, 255, (bs, h, w, 3), np.uint8
            )
            got = served(
                x_u8, np.asarray(inp["center"]), np.asarray(inp["scale"]),
                np.asarray(inp["bbox_height"]), np.asarray(inp["orig_shape"]),
                np.asarray(inp["bbox_info"]),
            )
            assert got["verts"].shape == (bs, 6890, 3)
            x = (jnp.asarray(x_u8).astype(jnp.float32) / 255.0 - mean) / std
            ref = live(
                variables, consts, x, inp["center"], inp["scale"],
                inp["bbox_height"], inp["orig_shape"], inp["bbox_info"],
            )["vis"]
            np.testing.assert_allclose(
                np.asarray(got["verts"]),
                np.asarray(ref["local_smpl_vertices"]), rtol=1e-5, atol=1e-5,
            )

    def test_demo_pipeline_from_bundle(self, setup, tmp_path):
        """DemoPipeline(bundle=...) serves the demo from the frozen AOT
        graph: no live model, no checkpoint, same output surface."""
        from whmr_tpu.data.assets import synthetic_smpl_assets as _assets
        from whmr_tpu.inference.pipeline import DemoPipeline

        cfg, model, variables, consts, inputs = setup
        exp, flat = export_serving(
            cfg, model, variables, consts, None, camcalib=False,
            platforms=("cpu",),
        )
        out_dir = str(tmp_path / "bundle_demo")
        save_exported(out_dir, exp, flat, cfg, None, False)
        pipe = DemoPipeline(
            cfg, None, _assets(), max_people=2, use_camcalib=False,
            bundle=out_dir,
        )
        assert pipe.model is None and pipe.variables is None
        img = np.random.RandomState(0).randint(0, 255, (320, 280, 3), np.uint8)
        result = pipe.run_image(img, "t.png")
        assert result["n_people"] >= 1
        assert result["verts"].shape[-2:] == (6890, 3)
        assert np.isfinite(result["verts"]).all()

        # mismatched flags fail loudly, not silently wrong
        with pytest.raises(ValueError, match="camcalib"):
            DemoPipeline(cfg, None, _assets(), use_camcalib=True,
                         bundle=out_dir)
        import dataclasses

        bad_cfg = dataclasses.replace(cfg, cam_img_size=(512, 512))
        with pytest.raises(ValueError, match="cam_img_size"):
            DemoPipeline(bad_cfg, None, _assets(), use_camcalib=False,
                         bundle=out_dir)

    def test_loader_needs_no_model_code(self, setup, tmp_path):
        """The bundle is consumed by a fresh process importing ONLY
        jax+numpy+the loader module — no flax model construction."""
        import subprocess
        import sys

        cfg, model, variables, consts, inputs = setup
        exp, flat = export_serving(
            cfg, model, variables, consts, 2, camcalib=False,
            platforms=("cpu",),
        )
        out_dir = str(tmp_path / "bundle_sub")
        save_exported(out_dir, exp, flat, cfg, 2, False)
        h, w = cfg.crop_hw
        code = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from whmr_tpu.inference.export import load_exported
served = load_exported({out_dir!r})
rng = np.random.RandomState(0)
out = served(
    rng.randint(0, 255, (2, {h}, {w}, 3), np.uint8),
    rng.uniform(200, 1080, (2, 2)).astype(np.float32),
    np.ones(2, np.float32), np.full(2, 300, np.float32),
    np.tile([720.0, 1280.0], (2, 1)).astype(np.float32),
    rng.randn(2, 5).astype(np.float32) / 10,
)
assert out["verts"].shape == (2, 6890, 3), out["verts"].shape
assert all(np.isfinite(np.asarray(v)).all() for v in out.values())
print("SUBPROCESS_OK")
"""
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        res = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            env=env, timeout=600,
        )
        assert "SUBPROCESS_OK" in res.stdout, res.stderr[-2000:]


class TestEvalExport:
    """Eval-variant bundles (whmr-export --eval): the metric-protocol
    graph — GT cam_rotmat input, fp32 crops, EVAL_OUTPUT_KEYS out —
    consumed by `whmr-eval --bundle`."""

    def _eval_args(self, cfg, inputs, b=2, seed=1):
        h, w = cfg.crop_hw
        rng = np.random.RandomState(seed)
        # a mildly tilted GT camera so the world-frame branch is exercised
        th = 0.2
        rot = np.array(
            [[1, 0, 0],
             [0, np.cos(th), -np.sin(th)],
             [0, np.sin(th), np.cos(th)]], np.float32,
        )
        return dict(
            img=rng.randn(b, h, w, 3).astype(np.float32),
            center=np.asarray(inputs["center"]),
            scale=np.asarray(inputs["scale"]),
            bbox_height=np.asarray(inputs["bbox_height"]),
            orig_shape=np.asarray(inputs["orig_shape"]),
            bbox_info=np.asarray(inputs["bbox_info"]),
            cam_rotmat=np.tile(rot, (b, 1, 1)),
        )

    def test_eval_round_trip_matches_live(self, setup, tmp_path):
        """save -> load -> call_eval reproduces the live eval-protocol
        forward (model.apply with GT cam_rotmat, evaluate.py:109-122)."""
        from whmr_tpu.inference.export import EVAL_OUTPUT_KEYS

        cfg, model, variables, consts, inputs = setup
        exp, flat = export_serving(
            cfg, model, variables, consts, 2, platforms=("cpu",),
            variant="eval",
        )
        out_dir = str(tmp_path / "bundle_eval")
        save_exported(out_dir, exp, flat, cfg, 2, False, variant="eval")
        served = load_exported(out_dir)
        assert served.variant == "eval"
        assert served.meta["output_keys"] == list(EVAL_OUTPUT_KEYS)

        args = self._eval_args(cfg, inputs)
        got = served.call_eval(**args)
        assert set(got) == set(EVAL_OUTPUT_KEYS)

        live = jax.jit(
            lambda v, c, img, cr, *a: model.apply(
                v, c, img, *a, train=False, cam_rotmat=cr
            )
        )(variables, consts, args["img"], args["cam_rotmat"],
          args["center"], args["scale"], args["bbox_height"],
          args["orig_shape"], args["bbox_info"])
        np.testing.assert_allclose(
            np.asarray(got["verts_world"]),
            np.asarray(live["global_output"]["global_verts"]),
            rtol=1e-5, atol=1e-5,
        )
        last = live["smpl_out"][-1]
        for bundle_key, live_key in (
            ("verts", "verts"), ("pose", "pose"),
            ("shape", "pred_shape"), ("camera", "pred_cam"),
        ):
            np.testing.assert_allclose(
                np.asarray(got[bundle_key]), np.asarray(last[live_key]),
                rtol=1e-5, atol=1e-5,
            )

        # the demo serving call must refuse an eval bundle (and the demo
        # pipeline must too) — variant mixups fail loudly
        with pytest.raises(ValueError, match="variant"):
            served(np.zeros((2, *cfg.crop_hw, 3), np.uint8),
                   args["center"], args["scale"], args["bbox_height"],
                   args["orig_shape"], args["bbox_info"])
        from whmr_tpu.data.assets import synthetic_smpl_assets as _assets
        from whmr_tpu.inference.pipeline import DemoPipeline

        with pytest.raises(ValueError, match="variant"):
            DemoPipeline(cfg, None, _assets(), use_camcalib=False,
                         bundle=out_dir)

    def test_eval_variant_guards(self, setup):
        """camcalib is a demo-graph branch; the eval protocol replaces it
        with the GT camera (eval.py:157-163)."""
        cfg, model, variables, consts, _ = setup
        with pytest.raises(ValueError, match="camcalib"):
            export_serving(cfg, model, variables, consts, 2,
                           camcalib=True, variant="eval")
        with pytest.raises(ValueError, match="variant"):
            export_serving(cfg, model, variables, consts, 2,
                           variant="nonsense")

    def test_call_eval_rejects_demo_bundle(self, setup, tmp_path):
        cfg, model, variables, consts, inputs = setup
        exp, flat = export_serving(
            cfg, model, variables, consts, 2, camcalib=False,
            platforms=("cpu",),
        )
        out_dir = str(tmp_path / "bundle_demo2")
        save_exported(out_dir, exp, flat, cfg, 2, False)
        served = load_exported(out_dir)
        assert served.variant == "demo"  # format-v1 default
        with pytest.raises(ValueError, match="whmr-export --eval"):
            served.call_eval(**self._eval_args(cfg, inputs))
