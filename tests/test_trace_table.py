"""scripts/trace_table.py parsing: lane selection + leaf filtering on a
synthetic Chrome-trace file shaped like a jax.profiler capture."""

import gzip
import json
import os
import subprocess
import sys


def _write_trace(tmp_path):
    run = tmp_path / "plugins" / "profile" / "run1"
    os.makedirs(run)
    events = [
        # device process with the xprof lane layout
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 1, "name": "thread_name",
         "args": {"name": "Steps"}},
        {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        # host process that must be ignored
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 7, "tid": 1, "name": "python", "ts": 0,
         "dur": 99999},
        # step + module spans cover the ops and must NOT be summed
        {"ph": "X", "pid": 3, "tid": 1, "name": "4", "ts": 0, "dur": 1000},
        {"ph": "X", "pid": 3, "tid": 2, "name": "jit_step(123)", "ts": 0,
         "dur": 1000},
        # ops lane: two leaves + one parent span with a nested child
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.1", "ts": 0,
         "dur": 400},
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.2", "ts": 400,
         "dur": 100},
        {"ph": "X", "pid": 3, "tid": 3, "name": "while_loop", "ts": 500,
         "dur": 500},  # parent: fusion.3 starts inside it
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.3", "ts": 600,
         "dur": 300},
    ]
    path = run / "vm.trace.json.gz"
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": events}, f)
    return tmp_path


def test_trace_table_leaf_ops_only(tmp_path):
    trace_dir = _write_trace(tmp_path)
    out = subprocess.run(
        [sys.executable, "scripts/trace_table.py", str(trace_dir),
         "--steps", "2"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr
    lines = [json.loads(l) for l in out.stdout.splitlines()]
    header, rows = lines[0], lines[1:]
    assert header["op_lanes"] == [[3, 3]]
    names = {r["op"]: r for r in rows}
    # parent while_loop excluded (fusion.3 nests inside), host lane and
    # Steps/Modules lanes excluded, durations are us -> ms / steps
    assert set(names) == {"fusion.1", "fusion.2", "fusion.3"}
    assert names["fusion.1"]["ms_per_step"] == 0.2  # 400us / 2 steps
    # header total = sum of leaf ops only
    assert header["device_op_ms_per_step"] == 0.4
