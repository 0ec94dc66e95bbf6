"""FULL-GRAPH parity vs a reference-faithful torch recomposition.

VERDICT round-2 items 2 and 8: the organ-level oracles (test_parity_compose)
validate ViT / Regressor-MLP / TzHead in isolation, but nothing proved the
COMPOSED graph — backbone -> deconv pyramid -> 3x MAF (grid_sample) ->
residual SMPL regressors -> global orient -> world SMPL — matches the
reference wiring end to end. These tests chain the entire converted graph
against tests/torch_oracle.TorchWHMROracle on random converted weights: the
strongest offline proxy for the BASELINE.md 0.5 mm PA-MPJPE gate
(reference models/whmr.py:503-678).

This test caught a real conversion-format bug: the reference flattens MAF
point features CHANNEL-major ((B, C, N).view, maf_extractor.py:100) while
the flax MAF originally flattened point-major, which would have scrambled
the fc1 inputs of every converted real checkpoint.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_oracle import TorchWHMROracle  # noqa: E402


def _randomize(model, seed=0, scale=0.05):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                b.copy_(1.0 + 0.5 * torch.rand(b.shape, generator=g))


def _example_inputs(batch, img_hw, seed=3):
    rng = np.random.RandomState(seed)
    h, w = img_hw
    img_h, img_w = 720.0, 1280.0
    bbox_height = rng.uniform(150, 500, size=(batch,)).astype(np.float32)
    center = np.stack(
        [rng.uniform(200, 1080, batch), rng.uniform(150, 570, batch)], axis=-1
    ).astype(np.float32)
    focal = np.float32(np.sqrt(img_h**2 + img_w**2))
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
    ).astype(np.float32)
    from scipy.spatial.transform import Rotation as ScipyRot

    cam_rotmat = (
        ScipyRot.from_euler("xz", rng.uniform(-0.3, 0.3, (batch, 2)))
        .as_matrix()
        .astype(np.float32)
    )
    return {
        "x": rng.randn(batch, h, w, 3).astype(np.float32),
        "center": center,
        "scale": (bbox_height / 200.0).astype(np.float32),
        "bbox_height": bbox_height,
        "orig_shape": np.tile(np.array([[img_h, img_w]], np.float32), (batch, 1)),
        "bbox_info": bbox_info,
        "cam_rotmat": cam_rotmat,
    }


class TestFullGraphParity:
    def test_whole_forward_matches_torch_oracle(self):
        import jax
        import jax.numpy as jnp

        from whmr_tpu.config import (
            DeconvConfig,
            PyMAFConfig,
            ViTConfig,
            WHMRConfig,
        )
        from whmr_tpu.data.assets import synthetic_smpl_assets
        from whmr_tpu.models.regressor import body_consts_from_assets
        from whmr_tpu.models.whmr import WHMR
        from whmr_tpu.utils.convert import convert_whmr_checkpoint

        from dataclasses import replace

        img = (128, 96)
        cfg = WHMRConfig(
            pymaf=PyMAFConfig(
                backbone="vitpose",
                mlp_dim=(32, 16, 8, 4),
                aux_supv_on=True,
                depth_supv_on=True,
            ),
            deconv=DeconvConfig(num_filters=(32, 32, 32)),
            vit=ViTConfig(
                img_size=img, embed_dim=64, depth=2, num_heads=2,
                drop_path_rate=0.0,
            ),
        )
        assets = synthetic_smpl_assets()
        oracle = TorchWHMROracle(
            assets,
            embed_dim=64,
            depth=2,
            num_heads=2,
            img_size=img,
            deconv_filters=(32, 32, 32),
            mlp_dim=(32, 16, 8, 4),
            aux_on=True,
            depth_on=True,
        ).eval()
        _randomize(oracle)

        batch = 2
        inp = _example_inputs(batch, img)
        with torch.no_grad():
            ref = oracle(
                torch.from_numpy(inp["x"]).permute(0, 3, 1, 2),
                torch.from_numpy(inp["center"]),
                torch.from_numpy(inp["scale"]),
                torch.from_numpy(inp["bbox_height"]),
                torch.from_numpy(inp["orig_shape"]),
                torch.from_numpy(inp["bbox_info"]),
                torch.from_numpy(inp["cam_rotmat"]),
            )

        converted = convert_whmr_checkpoint(
            {k: v for k, v in oracle.state_dict().items()}
        )
        consts = body_consts_from_assets(assets)
        model = WHMR(cfg)

        def fwd(variables, consts, inp):
            return model.apply(
                variables,
                consts,
                x=inp["x"],
                center=inp["center"],
                scale=inp["scale"],
                bbox_height=inp["bbox_height"],
                orig_shape=inp["orig_shape"],
                bbox_info=inp["bbox_info"],
                train=False,
                cam_rotmat=inp["cam_rotmat"],
            )

        variables = {
            "params": converted["params"],
            "batch_stats": converted["batch_stats"],
        }
        jinp = {k: jnp.asarray(v) for k, v in inp.items()}
        out = jax.jit(fwd)(variables, consts, jinp)

        def close(a, t, atol, what):
            np.testing.assert_allclose(
                np.asarray(a), t.numpy(), atol=atol, rtol=1e-4, err_msg=what
            )

        # every MAF step's mesh, not just the last — localizes divergence
        for i in (1, 2, 3):
            close(out["smpl_out"][i]["verts"], ref["smpl_out"][i]["verts"],
                  5e-4, f"verts step {i}")
        last, tlast = out["smpl_out"][3], ref["smpl_out"][3]
        close(last["rotmat"], tlast["rotmat"], 2e-4, "rotmat")
        close(last["pred_cam"], tlast["pred_cam"], 2e-4, "pred_cam")
        close(last["pred_shape"], tlast["pred_shape"], 2e-4, "pred_shape")
        close(last["kp_2d"], tlast["kp_2d"], 5e-4, "kp_2d")
        close(last["kp_2d_w"], tlast["kp_2d_w"], 5e-4, "kp_2d_w")
        close(last["focal_length"], tlast["focal_length"], 5e-3, "focal")
        close(last["pred_cam_t"], tlast["pred_cam_t"], 5e-4, "pred_cam_t")
        close(last["markers"], tlast["markers"], 5e-4, "markers")

        g = out["global_output"]
        close(g["global_rotmat"], ref["global_rotmat"], 2e-4, "global_rotmat")
        close(g["global_verts"], ref["global_verts"], 5e-4, "global_verts")

        for name in ("predict_u", "predict_v", "predict_uv_index", "predict_ann_index"):
            close(
                out["dp_out"][0][name],
                ref["dp_out"][name].permute(0, 2, 3, 1),
                5e-4,
                name,
            )
        close(out["dpth_out"][0], ref["dpth_out"].permute(0, 2, 3, 1), 5e-4, "depth")


class TestRealCheckpointManifest:
    """VERDICT item 8: prove the converter against the real checkpoint's key
    inventory, not a synthetic one.

    The inventory is derived from LIVE torch modules declared per the
    reference module graph (whmr.py:313-440 + cam_model.py:24-52) at the
    published full-size dims — independent of convert.py's own
    synthetic_reference_state_dict, which it is cross-checked against.
    """

    def test_converter_consumes_every_real_key_and_fills_the_model(self):
        import jax
        import jax.numpy as jnp

        from whmr_tpu.config import WHMRConfig
        from whmr_tpu.data.assets import synthetic_smpl_assets
        from whmr_tpu.models.regressor import body_consts_from_assets
        from whmr_tpu.models.whmr import WHMR
        from whmr_tpu.utils.convert import (
            check_against_model,
            convert_whmr_checkpoint,
            is_known_buffer,
            synthetic_reference_state_dict,
        )

        cfg = WHMRConfig()  # published config: ViT-B, aux on, depth off
        assets = synthetic_smpl_assets()
        oracle = TorchWHMROracle(
            assets,
            embed_dim=cfg.vit.embed_dim,
            depth=cfg.vit.depth,
            num_heads=cfg.vit.num_heads,
            img_size=cfg.vit.img_size,
            deconv_filters=cfg.deconv.num_filters,
            mlp_dim=cfg.pymaf.mlp_dim,
            aux_on=True,
            depth_on=False,
            with_cam_model=True,
        )
        sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

        converted, report = convert_whmr_checkpoint(sd, return_report=True)
        assert not report["unrecognized"], sorted(report["unrecognized"])[:20]

        consts = body_consts_from_assets(assets)
        model = WHMR(cfg)
        batch = 2
        h, w = cfg.crop_hw
        kwargs = dict(
            x=jnp.zeros((batch, h, w, 3)),
            center=jnp.zeros((batch, 2)) + 300.0,
            scale=jnp.ones((batch,)) + 1.0,
            bbox_height=jnp.zeros((batch,)) + 300.0,
            orig_shape=jnp.tile(jnp.asarray([[720.0, 1280.0]]), (batch, 1)),
            bbox_info=jnp.zeros((batch, 5)),
            full_x=jnp.zeros((batch, 64, 64, 3)),
        )
        variables = jax.eval_shape(
            lambda c: model.init({"params": jax.random.PRNGKey(0)}, c, **kwargs),
            consts,
        )
        missing, unexpected, mismatched = check_against_model(converted, variables)
        assert not missing, missing[:20]
        assert not unexpected, unexpected[:20]
        assert not mismatched, mismatched[:20]

        # Cross-check the independent torch-derived inventory against the
        # vendored synthetic manifest: identical non-buffer key sets + shapes.
        synth = synthetic_reference_state_dict(cfg)
        real_keys = {k for k in sd if not is_known_buffer(k)}
        synth_keys = {k for k in synth if not is_known_buffer(k)}
        assert real_keys == synth_keys, (
            sorted(real_keys - synth_keys)[:10],
            sorted(synth_keys - real_keys)[:10],
        )
        for k in sorted(real_keys):
            assert tuple(sd[k].shape) == tuple(np.shape(synth[k])), (
                k, sd[k].shape, np.shape(synth[k])
            )
