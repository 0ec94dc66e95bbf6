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
