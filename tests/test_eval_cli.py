"""End-to-end `whmr-eval` CLI tests: checkpoint load, protocol flags,
identity-camera guard, result-file dump, LSP parts mode."""

import os

import cv2
import numpy as np
import pytest

from whmr_tpu.utils.testing import tiny_config


@pytest.fixture(scope="module")
def eval_setup(tmp_path_factory):
    """Tmp checkpoint + small on-disk eval dataset (no cam_rotmat)."""
    import jax
    import jax.numpy as jnp

    from whmr_tpu.data.assets import synthetic_smpl_assets
    from whmr_tpu.models.regressor import body_consts_from_assets
    from whmr_tpu.models.whmr import WHMR
    from whmr_tpu.training.train_step import create_train_state
    from whmr_tpu.utils.checkpoint import CheckpointManager
    from whmr_tpu.utils.testing import make_example_inputs

    root = tmp_path_factory.mktemp("evalcli")
    cfg = tiny_config()
    consts = body_consts_from_assets(synthetic_smpl_assets())
    model = WHMR(cfg)
    inputs = make_example_inputs(cfg, 2)
    state = create_train_state(
        cfg, model, consts, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in inputs.items()},
    )
    ckpt_dir = root / "ckpt"
    CheckpointManager(str(ckpt_dir)).save(
        1,
        {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
            "step": np.ones((), np.int32),
            "epoch": 0,
            "batch_idx": 0,
        },
    )

    img_dir = root / "images"
    img_dir.mkdir()
    parts_dir = root / "parts"
    parts_dir.mkdir()
    rng = np.random.RandomState(0)
    n = 4
    names = []
    for i in range(n):
        img = rng.randint(0, 255, (320, 320, 3), np.uint8)
        name = f"e_{i:02d}.png"
        cv2.imwrite(str(img_dir / name), img)
        # GT part map: a blob of parts 1..6 in the middle
        part = np.zeros((320, 320), np.uint8)
        part[100:220, 100:220] = rng.randint(1, 7, (120, 120))
        cv2.imwrite(str(parts_dir / f"e_{i:02d}.png"), part)
        names.append(name)
    np.savez(
        root / "labels.npz",
        imgname=np.array(names),
        center=np.full((n, 2), 160, np.float32),
        scale=np.full((n,), 1.0, np.float32),
        pose=(rng.randn(n, 72) * 0.2).astype(np.float32),
        shape=(rng.randn(n, 10) * 0.3).astype(np.float32),
        has_smpl=np.ones(n, np.float32),
    )
    return {
        "root": root, "ckpt": str(ckpt_dir), "npz": str(root / "labels.npz"),
        "img_dir": str(img_dir), "parts_dir": str(parts_dir),
    }


class TestEvalCLI:
    def test_identity_cam_guard(self, eval_setup):
        """Labels without cam_rotmat must abort unless --allow_identity_cam."""
        from whmr_tpu.inference import eval_cli

        cfg_args = [
            "--checkpoint", eval_setup["ckpt"],
            "--dataset_npz", eval_setup["npz"],
            "--img_dir", eval_setup["img_dir"],
            "--batch_size", "2",
        ]
        with pytest.raises(SystemExit, match="cam_rotmat"):
            eval_cli.main(cfg_args + self._tiny_misc())

    def test_full_run_with_result_file(self, eval_setup, tmp_path, capsys):
        from whmr_tpu.inference import eval_cli

        out = str(tmp_path / "res.npz")
        eval_cli.main([
            "--checkpoint", eval_setup["ckpt"],
            "--dataset_npz", eval_setup["npz"],
            "--img_dir", eval_setup["img_dir"],
            "--batch_size", "2", "--allow_identity_cam",
            "--result_file", out,
        ] + self._tiny_misc())
        captured = capsys.readouterr().out
        assert "Final Results" in captured
        dump = np.load(out)
        assert dump["pred"].shape == (4, 14, 3)

    def test_parts_mode(self, eval_setup, capsys):
        from whmr_tpu.inference import eval_cli

        eval_cli.main([
            "--checkpoint", eval_setup["ckpt"],
            "--dataset_npz", eval_setup["npz"],
            "--img_dir", eval_setup["img_dir"],
            "--batch_size", "2", "--eval_parts",
            "--parts_dir", eval_setup["parts_dir"],
        ] + self._tiny_misc())
        captured = capsys.readouterr().out
        assert "Mask Accuracy" in captured
        assert "Parts Accuracy" in captured

    @staticmethod
    def _tiny_misc():
        """CLI --misc overrides reproducing tiny_config (checkpoint shapes
        must match the model built by the CLI)."""
        return [
            "--misc",
            "vit.embed_dim", "64", "vit.depth", "2", "vit.num_heads", "2",
            "vit.drop_path_rate", "0.0",
            "pymaf.mlp_dim", "32,16,8,4",
            "deconv.num_filters", "32,32,32",
        ]


class TestConvertRoundTrip:
    def test_synthetic_ckpt_through_convert_and_eval(self, eval_setup, tmp_path, capsys):
        """VERDICT item 1 'done' criterion: a reference-shaped .pt converts
        via whmr-convert (strict) and round-trips through whmr-eval."""
        import torch

        from whmr_tpu.inference import eval_cli
        from whmr_tpu.utils import convert_cli
        from whmr_tpu.utils.convert import synthetic_reference_state_dict

        cfg = tiny_config()
        sd = {k: torch.from_numpy(v) for k, v in
              synthetic_reference_state_dict(cfg).items()}
        pt_path = str(tmp_path / "ref_ckpt.pt")
        torch.save({"model": sd}, pt_path)

        out_dir = str(tmp_path / "converted")
        misc = TestEvalCLI._tiny_misc()
        convert_cli.main([
            "--torch_ckpt", pt_path, "--out", out_dir, "--strict",
        ] + misc)
        captured = capsys.readouterr().out
        assert "mismatched: 0" in captured
        assert "unmatched ckpt keys: 0" in captured

        eval_cli.main([
            "--checkpoint", out_dir,
            "--dataset_npz", eval_setup["npz"],
            "--img_dir", eval_setup["img_dir"],
            "--batch_size", "2", "--allow_identity_cam",
        ] + misc)
        captured = capsys.readouterr().out
        assert "Final Results" in captured


class TestHMRBaseline:
    def test_hmr_regressor_eval(self, eval_setup, tmp_path, capsys):
        """--regressor hmr evaluates the SPIN-style baseline
        (reference eval.py:52,174-176)."""
        import jax
        import jax.numpy as jnp

        from whmr_tpu.data.assets import synthetic_smpl_assets
        from whmr_tpu.inference import eval_cli
        from whmr_tpu.models.hmr import HMR
        from whmr_tpu.models.regressor import body_consts_from_assets
        from whmr_tpu.utils.checkpoint import CheckpointManager
        from whmr_tpu.utils.testing import make_example_inputs

        cfg = tiny_config()
        consts = body_consts_from_assets(synthetic_smpl_assets())
        model = HMR()
        x = jnp.asarray(make_example_inputs(cfg, 2)["x"])
        variables = jax.jit(
            lambda c, x: model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                c, x, train=False,
            )
        )(consts, x)
        ckpt_dir = str(tmp_path / "hmr_ckpt")
        CheckpointManager(ckpt_dir).save(
            1,
            {
                "params": jax.device_get(variables["params"]),
                "batch_stats": jax.device_get(variables["batch_stats"]),
            },
        )
        eval_cli.main([
            "--checkpoint", ckpt_dir,
            "--dataset_npz", eval_setup["npz"],
            "--img_dir", eval_setup["img_dir"],
            "--batch_size", "2", "--allow_identity_cam",
            "--regressor", "hmr",
        ] + TestEvalCLI._tiny_misc())
        captured = capsys.readouterr().out
        assert "Final Results" in captured


class TestBundleEval:
    @staticmethod
    def _parse_metrics(text):
        import re

        m = re.search(
            r"PVE: ([\d.]+)\nMPJPE: ([\d.]+)\nPA-MPJPE \(Reconstruction "
            r"Error\): ([\d.]+)", text,
        )
        assert m, text
        return tuple(float(g) for g in m.groups())

    def test_bundle_eval_matches_live(self, eval_setup, tmp_path, capsys):
        """whmr-export --eval -> whmr-eval --bundle scores the frozen
        artifact; metrics match the live-checkpoint run (same weights,
        same platform). batch_size 3 over 4 samples exercises the
        ragged-last-batch padding against the bundle's fixed shape."""
        from whmr_tpu.inference import eval_cli, export_cli

        misc = TestEvalCLI._tiny_misc()
        common = [
            "--dataset_npz", eval_setup["npz"],
            "--img_dir", eval_setup["img_dir"],
            "--batch_size", "3", "--allow_identity_cam",
        ] + misc

        eval_cli.main(["--checkpoint", eval_setup["ckpt"]] + common)
        live = self._parse_metrics(capsys.readouterr().out)

        bundle_dir = str(tmp_path / "eval_bundle")
        export_cli.main([
            "--checkpoint", eval_setup["ckpt"], "--output", bundle_dir,
            "--eval", "--batch_size", "3", "--platforms", "cpu", "--check",
        ] + misc)
        out = capsys.readouterr().out
        assert "variant=eval" in out and "outputs finite: True" in out

        eval_cli.main(["--bundle", bundle_dir] + common)
        frozen = self._parse_metrics(capsys.readouterr().out)
        np.testing.assert_allclose(frozen, live, rtol=1e-4, atol=1e-3)

        # a --batch_size above the bundle's fixed shape fails up front with
        # a message naming the bundle, not deep in run_evaluation
        with pytest.raises(SystemExit, match="fixed batch"):
            eval_cli.main([
                "--bundle", bundle_dir,
                "--dataset_npz", eval_setup["npz"],
                "--img_dir", eval_setup["img_dir"],
                "--batch_size", "5", "--allow_identity_cam",
            ] + misc)

    def test_bundle_flag_guards(self, eval_setup, tmp_path):
        from whmr_tpu.inference import eval_cli

        base = [
            "--dataset_npz", eval_setup["npz"],
            "--img_dir", eval_setup["img_dir"],
        ] + TestEvalCLI._tiny_misc()
        with pytest.raises(SystemExit, match="exactly one"):
            eval_cli.main(base)
        with pytest.raises(SystemExit, match="exactly one"):
            eval_cli.main(
                ["--checkpoint", eval_setup["ckpt"], "--bundle", "b"] + base
            )

    def test_polymorphic_bundle_eval(self, eval_setup, tmp_path, capsys):
        """--batch_size 0 exports a batch-polymorphic eval bundle: the
        ragged last batch (4 samples at batch 3 -> shapes 3 and 1) runs
        WITHOUT padding, each at its own concrete shape."""
        from whmr_tpu.inference import eval_cli, export_cli

        misc = TestEvalCLI._tiny_misc()
        common = [
            "--dataset_npz", eval_setup["npz"],
            "--img_dir", eval_setup["img_dir"],
            "--batch_size", "3", "--allow_identity_cam",
        ] + misc

        eval_cli.main(["--checkpoint", eval_setup["ckpt"]] + common)
        live = self._parse_metrics(capsys.readouterr().out)

        bundle_dir = str(tmp_path / "eval_bundle_poly")
        export_cli.main([
            "--checkpoint", eval_setup["ckpt"], "--output", bundle_dir,
            "--eval", "--batch_size", "0", "--platforms", "cpu",
        ] + misc)
        capsys.readouterr()

        eval_cli.main(["--bundle", bundle_dir] + common)
        frozen = self._parse_metrics(capsys.readouterr().out)
        np.testing.assert_allclose(frozen, live, rtol=1e-4, atol=1e-3)
