"""Every console-script parser must format its --help without crashing.

Regression for an unescaped ``%`` in an argparse help string
(training/cli.py ``--grad_accum``): argparse interpolates ``%``-codes in
help text at format time, so a bare ``%`` only explodes when a user runs
``--help`` — never in tests that parse real argv. Formatting the help for
every CLI parser keeps the whole family covered.
"""

from __future__ import annotations

import importlib

import pytest

# module path -> parser factory name (all follow the build_parser convention
# except the two that build inside main()).
_PARSER_FACTORIES = [
    ("whmr_tpu.training.cli", "build_parser"),
    ("whmr_tpu.inference.eval_cli", "build_parser"),
    ("whmr_tpu.inference.demo_cli", "build_parser"),
    ("whmr_tpu.inference.video_cli", "build_parser"),
    ("whmr_tpu.inference.export_cli", "build_parser"),
    ("whmr_tpu.inference.serve_cli", "build_parser"),
    ("whmr_tpu.data.data_cli", "build_parser"),
]


@pytest.mark.parametrize("module,factory", _PARSER_FACTORIES)
def test_help_formats(module, factory):
    mod = importlib.import_module(module)
    parser = getattr(mod, factory)()
    text = parser.format_help()
    assert "--" in text  # sanity: it rendered actual options


def test_agora_and_convert_help():
    """agora/convert build parsers inside main(); drive them via --help."""
    for module in ("whmr_tpu.inference.agora", "whmr_tpu.utils.convert_cli"):
        mod = importlib.import_module(module)
        with pytest.raises(SystemExit) as e:
            mod.main(["--help"])
        assert e.value.code == 0


class TestTrainCLIArgValidation:
    """whmr-train must reject, not silently mangle, malformed argument
    combinations (round-5 review: zip truncation dropped whole datasets;
    odd --misc lists shifted every following override onto the wrong key)."""

    def test_odd_misc_list_rejected(self):
        from whmr_tpu.training import cli

        with pytest.raises(SystemExit, match="odd number"):
            cli.main([
                "--train_npz", "a.npz", "--misc", "train.base_lr",
            ])

    def test_img_dir_count_mismatch_rejected(self):
        from whmr_tpu.training import cli

        with pytest.raises(SystemExit, match="must match"):
            cli.main([
                "--train_npz", "a.npz", "--train_npz", "b.npz",
                "--train_npz", "c.npz",
                "--img_dir", "d1", "--img_dir", "d2",
            ])

    def test_single_img_dir_broadcasts(self, tmp_path):
        """One shared image root for several label files must reach EVERY
        dataset (the zip-truncation bug dropped all but the first)."""
        from whmr_tpu.training import cli

        # missing npz files fail at NpzDataset load — AFTER the arg checks;
        # the error naming the second file proves it was NOT dropped
        with pytest.raises(Exception) as e:
            cli.main([
                "--train_npz", str(tmp_path / "a.npz"),
                "--train_npz", str(tmp_path / "b.npz"),
                "--img_dir", str(tmp_path),
            ])
        assert "a.npz" in str(e.value)
