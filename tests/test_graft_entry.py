"""Driver entry-point tests: replicate the driver's EXACT invocation.

The round-2 multi-chip dryrun regressed because no test exercised
`__graft_entry__` the way the driver does — a fresh process with
JAX_PLATFORMS=axon in the environment (MULTICHIP_r02.json, VERDICT round 2
item 1). These tests run the real subprocess so a guard regression fails
the suite, not the round.

Reference stand-in: the reference's distributed entry is `train.py:26-28`
(dist.init_process_group); here the driver-visible multi-chip evidence is
`dryrun_multichip`.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_subprocess(code: str, platforms: str, timeout: int = 1500):
    """Run `python -c code` from the repo root, as the driver does."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = platforms
    # The conftest pins XLA_FLAGS to 8 host devices; keep it — the driver's
    # env may or may not carry the flag, and dryrun_multichip must cope with
    # both (it appends the flag itself only when absent).
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.mark.smoke
@pytest.mark.parametrize("platforms", ["axon", "axon,cpu"])
def test_cpu_fallback_fires_for_axon_priority_list(platforms):
    """The guard must fire for BOTH 'axon' and the pinned 'axon,cpu' list
    (the round-2 regression compared == 'axon' and never matched)."""
    code = (
        "from __graft_entry__ import _cpu_fallback_for_axon\n"
        "_cpu_fallback_for_axon(8)\n"
        "import jax\n"
        "assert jax.default_backend() == 'cpu', jax.default_backend()\n"
        "assert len(jax.devices()) >= 8, len(jax.devices())\n"
        "print('fallback OK', len(jax.devices()))\n"
    )
    res = _run_subprocess(code, platforms, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "fallback OK" in res.stdout


@pytest.mark.smoke
def test_cpu_fallback_leaves_real_multichip_backends_alone():
    """A host whose platform list does NOT lead with axon (e.g. real TPU
    pods or plain CPU) must keep its backend."""
    code = (
        "from __graft_entry__ import _cpu_fallback_for_axon\n"
        "_cpu_fallback_for_axon(8)\n"
        "import jax\n"
        "assert jax.default_backend() == 'cpu'\n"
        "assert len(jax.devices()) >= 8\n"
        "print('noop OK')\n"
    )
    res = _run_subprocess(code, "cpu", timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "noop OK" in res.stdout


@pytest.mark.smoke
def test_axon_leads_decision_table():
    """The guard's DECISION, tested directly: once the backend is 'cpu',
    observable jax state is identical whether a no-op or a wrongly-firing
    guard ran, so the subprocess tests above cannot catch a guard that
    overrides EVERY platform list (which would silently run a real TPU
    pod's dryrun on virtual CPU devices)."""
    from __graft_entry__ import _axon_leads

    assert _axon_leads("axon")
    assert _axon_leads("axon,cpu")
    assert _axon_leads(" axon , cpu ")
    assert not _axon_leads("cpu")
    assert not _axon_leads("tpu")
    assert not _axon_leads("tpu,cpu")
    assert not _axon_leads("cpu,axon")  # axon present but not leading
    assert not _axon_leads("")
    assert not _axon_leads(" , ")


def test_dryrun_multichip_as_the_driver_runs_it():
    """Byte-for-byte the driver command: fresh process, repo cwd, axon env.

    Done-criterion from VERDICT round 2 item 1: this subprocess green in the
    suite AND MULTICHIP_r03.json ok:true.
    """
    code = "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
    res = _run_subprocess(code, os.environ.get("JAX_PLATFORMS", "axon"))
    assert res.returncode == 0, (res.stdout[-2000:], res.stderr[-4000:])
    assert "dryrun_multichip OK" in res.stdout


@pytest.mark.slow
def test_entry_compile_check():
    """Compile-check entry() the way the driver does (single chip), but on
    the CPU backend: trace + lower the jitted fn on the returned args."""
    import jax

    from __graft_entry__ import entry

    fn, example_args = entry()
    lowered = jax.jit(fn).lower(*example_args)
    assert lowered is not None
    shapes = jax.eval_shape(fn, *example_args)
    assert shapes[0].shape[-1] == 3  # verts
    assert shapes[1].shape[-2:] == (6890, 3)  # global_verts
