"""bench.py wait_for_tpu harness tests.

The driver's end-of-round bench depends on this helper surviving pool
outages (BENCH_r*.json is the round's headline evidence); these tests pin
its three behaviors without touching any real backend.
"""

import subprocess
import sys

import pytest

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


class TestWaitForTpu:
    @staticmethod
    def _fake_popen(stdout):
        class FakeProc:
            def __init__(self, *a, **k):
                pass

            def communicate(self, timeout=None):
                return stdout, ""

        return FakeProc

    def test_noop_off_axon(self, monkeypatch):
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        calls = []
        monkeypatch.setattr(
            subprocess, "Popen", lambda *a, **k: calls.append(a)
        )
        bench.wait_for_tpu(deadline_s=0.01)
        assert not calls  # never probes when the platform isn't axon

    @staticmethod
    def _fake_axon_jax(monkeypatch):
        # the pytest process has live jax configured to cpu, which
        # (deliberately) beats the env var — stand in an axon-configured jax
        import types

        monkeypatch.setitem(
            sys.modules, "jax",
            types.SimpleNamespace(
                config=types.SimpleNamespace(jax_platforms="axon,cpu")
            ),
        )

    def test_in_process_cpu_override_beats_env(self, monkeypatch):
        """jax.config.update('jax_platforms', 'cpu') (the tests' own
        pattern) must suppress probing even with JAX_PLATFORMS=axon in the
        env — otherwise in-process CPU runs stall on a dead pool."""
        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        import types

        monkeypatch.setitem(
            sys.modules, "jax",
            types.SimpleNamespace(
                config=types.SimpleNamespace(jax_platforms="cpu")
            ),
        )
        calls = []
        monkeypatch.setattr(
            subprocess, "Popen", lambda *a, **k: calls.append(a)
        )
        bench.wait_for_tpu(deadline_s=5.0)
        assert not calls

    def test_live_in_process_client_skips_probe(self, monkeypatch):
        """A process that already holds a live backend client must NOT
        probe: the subprocess probes would queue behind its own grant
        (one TPU client at a time) and spin until the deadline."""
        import types

        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        monkeypatch.setitem(
            sys.modules, "jax",
            types.SimpleNamespace(
                config=types.SimpleNamespace(jax_platforms="axon"),
                _src=types.SimpleNamespace(
                    xla_bridge=types.SimpleNamespace(
                        _backends={"axon": object()}
                    )
                ),
            ),
        )
        calls = []
        monkeypatch.setattr(
            subprocess, "Popen", lambda *a, **k: calls.append(a)
        )
        bench.wait_for_tpu(deadline_s=5.0)
        assert not calls

    def test_cpu_backend_does_not_skip_probe(self, monkeypatch):
        """An initialized CPU backend holds no pool grant — probing must
        still happen (only a live AXON client skips it)."""
        import types

        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        monkeypatch.setitem(
            sys.modules, "jax",
            types.SimpleNamespace(
                config=types.SimpleNamespace(jax_platforms="axon"),
                _src=types.SimpleNamespace(
                    xla_bridge=types.SimpleNamespace(
                        _backends={"cpu": object()}
                    )
                ),
            ),
        )
        probed = []
        fake = self._fake_popen("TPU_OK\n")
        monkeypatch.setattr(
            subprocess, "Popen",
            lambda *a, **k: probed.append(a) or fake(*a, **k),
        )
        bench.wait_for_tpu(deadline_s=5.0)
        assert probed  # the probe subprocess WAS launched

    def test_returns_on_probe_ok(self, monkeypatch):
        monkeypatch.setenv("JAX_PLATFORMS", "axon,cpu")
        self._fake_axon_jax(monkeypatch)
        monkeypatch.setattr(subprocess, "Popen", self._fake_popen("TPU_OK\n"))
        bench.wait_for_tpu(deadline_s=5.0)  # returns without sleeping

    def test_deadline_expires_and_proceeds(self, monkeypatch, capsys):
        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        monkeypatch.setenv("WHMR_BENCH_TPU_WAIT", "0.05")
        self._fake_axon_jax(monkeypatch)
        monkeypatch.setattr(
            subprocess, "Popen", self._fake_popen("TPU_PROBE_TIMEOUT\n")
        )
        slept = []
        monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
        bench.wait_for_tpu(deadline_s=900.0)  # env overrides to 0.05s
        err = capsys.readouterr().err
        assert "proceeding anyway" in err

    def test_probe_code_self_times_out(self):
        """The probe child must exit cleanly on its own (SIGALRM), never be
        SIGKILLed mid-claim: run the probe snippet with a 1s alarm against
        a module that hangs on import, and check the clean timeout path."""
        code = (
            "import signal\n"
            "def _to(*_):\n"
            "    raise TimeoutError\n"
            "signal.signal(signal.SIGALRM, _to)\n"
            "signal.alarm(1)\n"
            "try:\n"
            "    import time\n"
            "    time.sleep(30)\n"  # stands in for a hanging backend init
            "    print('TPU_OK')\n"
            "except TimeoutError:\n"
            "    print('TPU_PROBE_TIMEOUT')\n"
        )
        res = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=10,
        )
        assert "TPU_PROBE_TIMEOUT" in res.stdout
        assert res.returncode == 0  # clean exit, not a kill
