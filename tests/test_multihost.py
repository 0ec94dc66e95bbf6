"""Multi-host (2-process) distributed test — VERDICT round-2 item 3.

Spawns two CPU processes (4 virtual devices each), runs
`parallel.mesh.init_distributed` (the DCN rendezvous replacing the
reference's tcp:// NCCL init, train.py:26-28 / train_options.py:44-49),
and checks:
- the global mesh spans both processes (8 devices, dp4 x tp2),
- one full jitted train step produces the SAME finite loss on both hosts
  (the GSPMD all-reduce is the DDP-gradient-sync equivalent),
- `BatchLoader(num_hosts, host_index)` consumes DISJOINT index sets whose
  union covers the epoch (DistributedSampler parity, trainer.py:129).
"""

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_step_and_loader_sharding(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker pins its own 4-device pool
    env["JAX_PLATFORMS"] = "cpu"
    outs = [str(tmp_path / f"worker{i}.json") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(port), outs[i]],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-4000:]}"
        assert f"MULTIHOST OK pid={i}" in logs[i]

    results = [json.load(open(o)) for o in outs]
    i0, i1 = set(results[0]["indices"]), set(results[1]["indices"])
    assert i0 and i1
    assert not (i0 & i1), sorted(i0 & i1)  # disjoint per-host shards
    assert i0 | i1 == set(range(64))       # epoch fully covered
    # DDP-equivalent: both hosts compute the identical global loss.
    assert abs(results[0]["loss"] - results[1]["loss"]) < 1e-6
