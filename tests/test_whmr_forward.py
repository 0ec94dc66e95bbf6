"""End-to-end WHMR forward tests: shapes, finiteness, jit, config variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whmr_tpu.config import WHMRConfig
from whmr_tpu.data.assets import synthetic_smpl_assets
from whmr_tpu.models.regressor import body_consts_from_assets
from whmr_tpu.models.whmr import WHMR
from whmr_tpu.utils.testing import make_example_inputs, tiny_config


def build(cfg, batch=2, with_full_img=False, train=False, seed=0):
    consts = body_consts_from_assets(synthetic_smpl_assets())
    model = WHMR(cfg)
    inputs = make_example_inputs(cfg, batch, with_full_img=with_full_img, seed=seed)
    args = dict(
        x=jnp.asarray(inputs["x"]),
        center=jnp.asarray(inputs["center"]),
        scale=jnp.asarray(inputs["scale"]),
        bbox_height=jnp.asarray(inputs["bbox_height"]),
        orig_shape=jnp.asarray(inputs["orig_shape"]),
        bbox_info=jnp.asarray(inputs["bbox_info"]),
    )
    if with_full_img:
        args["full_x"] = jnp.asarray(inputs["full_x"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        consts, train=train, **args,
    )
    return model, variables, consts, args


class TestTinyForward:
    def test_output_structure(self):
        cfg = tiny_config()
        model, variables, consts, args = build(cfg)
        out = model.apply(variables, consts, **args)
        assert len(out["smpl_out"]) == cfg.pymaf.n_iter + 1
        last = out["smpl_out"][-1]
        b = args["x"].shape[0]
        assert last["verts"].shape == (b, 6890, 3)
        assert last["kp_2d"].shape == (b, 49, 2)
        assert last["kp_2d_w"].shape == (b, 49, 2)
        assert last["rotmat"].shape == (b, 24, 3, 3)
        assert last["theta"].shape == (b, 3 + 10 + 72)
        assert last["focal_length"].shape == (b,)
        assert out["global_output"]["global_verts"].shape == (b, 6890, 3)
        assert out["global_output"]["global_pose"].shape == (b, 72)
        assert out["vis"]["render_rotmat"].shape == (b, 3, 3)
        assert len(out["dp_out"]) == 1  # aux_supv_on default

    def test_n_iter_2_regroups_all_deconvs(self):
        """n_iter=2 regroups the 3 deconv layers into 2 pyramid levels
        (reference whmr.py:540-541: [0:6],[6:9]) — the final feature map
        stays full resolution and the aux heads keep their shapes."""
        from dataclasses import replace

        cfg = tiny_config()
        cfg = replace(cfg, pymaf=replace(cfg.pymaf, n_iter=2))
        model, variables, consts, args = build(cfg)
        out = model.apply(variables, consts, **args)
        assert len(out["smpl_out"]) == 3  # init + 2 MAF steps
        # dp head runs on the FULL-resolution final level: 8x upsampled
        # tokens, sliced to the vitpose 4:3 grid (128x96 at full size).
        dp = out["dp_out"][-1]
        hp, wp = cfg.vit.grid_hw
        assert dp["predict_uv_index"].shape[1] == hp * 8
        # ALL deconv layers must exist in the param tree (n_iter only
        # regroups them; n_iter=2 previously dropped deconv2 entirely).
        for i in range(3):
            assert f"deconv{i}" in variables["params"], i

    def test_iuv_logits_runs_all_deconvs_regardless_of_n_iter(self):
        """iuv_logits (the IUVProposalDetector subgraph) must traverse the
        FULL deconv pyramid: the param tree is n_iter-independent, so the
        same weights under n_iter=2 and n_iter=3 must produce identical
        full-resolution logits (regression: it stopped after n_iter
        blocks, feeding dp_head the half-resolution level — same channel
        count, no shape error, silently wrong logits)."""
        from dataclasses import replace

        cfg3 = tiny_config()
        model3, variables, _, args = build(cfg3)
        cfg2 = replace(cfg3, pymaf=replace(cfg3.pymaf, n_iter=2))
        model2 = WHMR(cfg2)
        out3 = model3.apply(variables, args["x"], train=False,
                            method=model3.iuv_logits)
        out2 = model2.apply(variables, args["x"], train=False,
                            method=model2.iuv_logits)
        hp, _ = cfg3.vit.grid_hw
        assert out3.shape[1] == hp * 8  # full-resolution level
        np.testing.assert_array_equal(np.asarray(out3), np.asarray(out2))

    def test_all_finite(self):
        cfg = tiny_config()
        model, variables, consts, args = build(cfg)
        out = model.apply(variables, consts, **args)
        for leaf in jax.tree.leaves(out):
            assert np.all(np.isfinite(np.asarray(leaf)))

    def test_eval_rotmats_orthonormal(self):
        """Eval path applies unbiased Gram-Schmidt (whmr.py:129-130)."""
        cfg = tiny_config()
        model, variables, consts, args = build(cfg)
        out = model.apply(variables, consts, **args, train=False)
        r = np.asarray(out["smpl_out"][-1]["rotmat"]).reshape(-1, 3, 3)
        eye = np.broadcast_to(np.eye(3), r.shape)
        np.testing.assert_allclose(r @ r.transpose(0, 2, 1), eye, atol=1e-4)

    def test_jit_forward(self):
        cfg = tiny_config()
        model, variables, consts, args = build(cfg)

        @jax.jit
        def fwd(variables, consts, args):
            return model.apply(variables, consts, **args)

        out = fwd(variables, consts, args)
        assert out["smpl_out"][-1]["verts"].shape[0] == args["x"].shape[0]

    def test_camcalib_path(self):
        """full_x branch: CamCalib drives cam_rotmat + render_rotmat."""
        cfg = tiny_config()
        model, variables, consts, args = build(cfg, with_full_img=True)
        out = model.apply(variables, consts, **args)
        r = np.asarray(out["vis"]["cam_rotmat"])
        eye = np.broadcast_to(np.eye(3), r.shape)
        np.testing.assert_allclose(r @ r.transpose(0, 2, 1), eye, atol=1e-4)
        # pitch/roll nonzero -> not identity
        assert np.abs(r - eye).max() > 1e-6

    def test_gt_cam_rotmat_path(self):
        """Providing cam_rotmat skips CamCalib (eval protocol, eval.py:177-179)."""
        cfg = tiny_config()
        model, variables, consts, args = build(cfg)
        rot = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
        out = model.apply(variables, consts, **args, cam_rotmat=rot)
        np.testing.assert_allclose(np.asarray(out["vis"]["cam_rotmat"]), np.asarray(rot))

    def test_train_mode_with_dropout(self):
        cfg = tiny_config()
        model, variables, consts, args = build(cfg, train=True)
        out = model.apply(
            variables, consts, **args, train=True,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        preds, new_state = out
        assert "batch_stats" in new_state
        for leaf in jax.tree.leaves(preds["smpl_out"][-1]):
            assert np.all(np.isfinite(np.asarray(leaf)))

    def test_h36m_regressor_eval_path(self):
        cfg = tiny_config()
        consts = body_consts_from_assets(synthetic_smpl_assets())
        model, variables, _, args = build(cfg)
        out = model.apply(
            variables, consts, **args, j_regressor=consts.j_regressor_h36m
        )
        assert out["smpl_out"][-1]["kp_3d"].shape == (2, 14, 3)
        assert out["global_output"]["global_kp_3d"].shape == (2, 14, 3)


class TestResnetVariant:
    def test_res50_forward(self):
        cfg = tiny_config(backbone="res50")
        model, variables, consts, args = build(cfg)
        out = model.apply(variables, consts, **args)
        assert out["smpl_out"][-1]["verts"].shape == (2, 6890, 3)


class TestFullSizeViT:
    @pytest.mark.slow
    def test_full_vitpose_shapes(self):
        cfg = WHMRConfig()
        model, variables, consts, args = build(cfg, batch=1)
        out = model.apply(variables, consts, **args)
        assert out["smpl_out"][-1]["verts"].shape == (1, 6890, 3)
        # Tz head token dim must be 18*12=216 (whmr.py:423): implied by
        # success; double-check param shape.
        tz = variables["params"]["tz_head"]["fc1"]["kernel"]
        assert tz.shape[0] == 216
