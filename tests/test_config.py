"""Config system tests: overrides, YAML loading, hashability."""

import textwrap

import pytest

from whmr_tpu.config import WHMRConfig, load_yaml, vit_huge, vit_large

pytestmark = pytest.mark.smoke


class TestOverrides:
    def test_dotted_overrides(self):
        cfg = WHMRConfig().with_overrides(
            **{"pymaf.n_iter": 2, "train.batch_size": 32, "loss.kp_2d_w": 5.0}
        )
        assert cfg.pymaf.n_iter == 2
        assert cfg.train.batch_size == 32
        assert cfg.loss.kp_2d_w == 5.0
        # untouched fields keep defaults
        assert cfg.pymaf.backbone == "vitpose"

    def test_string_coercion(self):
        cfg = WHMRConfig().with_overrides(
            **{"pymaf.aux_supv_on": "false", "train.stage": "1", "train.base_lr": "0.001"}
        )
        assert cfg.pymaf.aux_supv_on is False
        assert cfg.train.stage == 1
        assert cfg.train.base_lr == 0.001

    def test_hashable_for_jit_static(self):
        assert hash(WHMRConfig()) == hash(WHMRConfig())
        a = WHMRConfig()
        b = a.with_overrides(**{"pymaf.n_iter": 2})
        assert hash(a) != hash(b)


class TestYaml:
    def test_reference_yaml_mapping(self, tmp_path):
        """Reference pymaf_config.yaml keys map onto the dataclass tree."""
        y = tmp_path / "cfg.yaml"
        y.write_text(textwrap.dedent("""
            SOLVER:
              BASE_LR: 0.0001
              GAMMA: 0.5
              EPOCHS: [100, 150]
            TRAIN:
              STAGE: 1
              BATCH_SIZE: 16
            LOSS:
              KP_3D_W: 150.0
              INDEX_WEIGHTS: 5.0
              PART_WEIGHTS: 0.6
            MODEL:
              PyMAF:
                BACKBONE: 'res50'
                N_ITER: 3
                MLP_DIM: [256, 128, 64, 32]
                AUX_SUPV_ON: False
        """))
        cfg = load_yaml(str(y))
        assert cfg.train.base_lr == 0.0001
        assert cfg.train.stage == 1
        assert cfg.train.batch_size == 16
        assert cfg.loss.kp_3d_w == 150.0
        assert cfg.pymaf.backbone == "res50"
        assert cfg.pymaf.aux_supv_on is False
        # 1:1 mappings previously dropped silently (round-2 review finding)
        assert cfg.loss.index_weights == 5.0
        assert cfg.loss.part_weights == 0.6
        assert cfg.train.lr_gamma == 0.5
        assert cfg.train.lr_decay_epochs == (100, 150)  # tuple-ized: hashable
        hash(cfg)  # frozen config must stay jit-static


class TestPresets:
    def test_vit_presets(self):
        l = vit_large()
        h = vit_huge()
        assert l.embed_dim == 1024 and l.depth == 24 and l.remat
        assert h.embed_dim == 1280 and h.depth == 32
        # TP divisibility: heads divide evenly over a 2-way model axis
        assert l.num_heads % 2 == 0 and h.num_heads % 2 == 0

    def test_vit_preset_yamls_match_code_presets(self):
        """configs/vit-{l,h}.yaml select the exact vit_large()/vit_huge()
        geometry through the MODEL.VIT yaml section."""
        import os

        root = os.path.join(os.path.dirname(__file__), "..", "configs")
        cl = load_yaml(os.path.join(root, "vit-l.yaml"))
        ch = load_yaml(os.path.join(root, "vit-h.yaml"))
        assert cl.vit == vit_large(), (cl.vit, vit_large())
        assert ch.vit == vit_huge(), (ch.vit, vit_huge())
        assert cl.pymaf.backbone == ch.pymaf.backbone == "vitpose"


class TestConfigFromArgs:
    def test_cfg_file_plus_misc_layering(self):
        """config_from_args layers --misc over --cfg_file (the reference's
        parse_args_extend order, core/cfgs.py:72-96) and is the shared
        resolver for every CLI."""
        import argparse
        import os

        from whmr_tpu.config import config_from_args

        root = os.path.join(os.path.dirname(__file__), "..", "configs")
        args = argparse.Namespace(
            cfg_file=os.path.join(root, "vit-l.yaml"),
            misc=["vit.depth", "6", "train.batch_size", "8"],
        )
        cfg = config_from_args(args)
        assert cfg.vit.embed_dim == 1024  # from the YAML
        assert cfg.vit.depth == 6         # misc wins over YAML
        assert cfg.train.batch_size == 8
        # absent attributes fall back to defaults
        assert config_from_args(argparse.Namespace()) == WHMRConfig()


class TestCliParsers:
    def test_misc_overrides_in_all_clis(self):
        from whmr_tpu.inference.demo_cli import build_parser as demo_p
        from whmr_tpu.inference.eval_cli import build_parser as eval_p
        from whmr_tpu.training.cli import build_parser as train_p

        for build in (demo_p, eval_p, train_p):
            parser = build()
            assert any(a.dest == "misc" for a in parser._actions)


class TestReferenceYamlFile:
    def test_loads_actual_reference_config(self):
        """Load the real reference pymaf_config.yaml when present."""
        import os
        import pytest

        path = "/root/reference/configs/pymaf_config.yaml"
        if not os.path.exists(path):
            pytest.skip("reference checkout not available")
        from whmr_tpu.config import load_yaml

        cfg = load_yaml(path)
        assert cfg.pymaf.backbone == "vitpose"
        assert cfg.pymaf.n_iter == 3
        assert cfg.pymaf.aux_supv_on is True
        assert cfg.train.stage == 2
        assert cfg.train.batch_size == 64
        assert cfg.train.base_lr == 5e-5
        assert cfg.loss.kp_3d_w == 300.0
        assert cfg.pymaf.mlp_dim == (256, 128, 64, 32)


class TestShippedDefaultYaml:
    def test_default_yaml_matches_defaults(self):
        """configs/default.yaml parses and reproduces the dataclass defaults."""
        import os

        from whmr_tpu.config import WHMRConfig, load_yaml

        path = os.path.join(os.path.dirname(__file__), "..", "configs", "default.yaml")
        assert load_yaml(path) == WHMRConfig()
