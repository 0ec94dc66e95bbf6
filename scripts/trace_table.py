"""Summarize a jax.profiler trace into a top-ops table.

VERDICT r3 item 4: the BASELINE.md roofline was assembled from hand-built
segment benches; this reads an actual captured trace (whmr-train
--profile DIR or bench.py --profile DIR) and prints the top-N ops by
total device time, so the segment table can be reconciled against what
the chip really ran.

jax.profiler.start_trace writes <dir>/plugins/profile/<run>/*.trace.json.gz
(Chrome/Perfetto trace events). Device lanes carry one complete event per
fused XLA op execution; we aggregate by event name over the device pids
and skip host/python lanes.

Usage: python scripts/trace_table.py TRACE_DIR [--top 15] [--steps K]
`--steps` divides totals by K (the number of profiled steps) so the
table reads in ms/step.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
from collections import defaultdict


def find_trace_file(trace_dir: str) -> str:
    pats = [
        os.path.join(trace_dir, "**", "*.trace.json.gz"),
        os.path.join(trace_dir, "**", "*.trace.json"),
    ]
    hits = []
    for p in pats:
        hits.extend(glob.glob(p, recursive=True))
    if not hits:
        raise SystemExit(f"no *.trace.json[.gz] under {trace_dir}")
    return max(hits, key=os.path.getmtime)


def load_events(path: str):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", data if isinstance(data, list) else [])


_DEVICE_RE = re.compile(r"TPU|/device:|XLA Op|Accelerator", re.IGNORECASE)


def device_pids(events) -> set:
    """pids whose process_name metadata looks like a device lane."""
    pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = (e.get("args") or {}).get("name", "")
            if _DEVICE_RE.search(name):
                pids.add(e.get("pid"))
    return pids


def op_lanes(events, pids) -> set:
    """(pid, tid) of the per-op device lanes. xprof lays a device pid out
    as parallel tids — Steps (step-number spans), XLA Modules (one span
    per program execution), XLA Ops (the real per-fusion timeline),
    Async/Overlay extras. Summing across lanes double-counts: a module
    span covers all its ops. Keep the 'XLA Ops' lanes only."""
    lanes = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name" \
                and e.get("pid") in pids:
            if (e.get("args") or {}).get("name") == "XLA Ops":
                lanes.add((e.get("pid"), e.get("tid")))
    return lanes


def _leaf_events(events, keep_lanes):
    """Keep only LEAF X-events per (pid, tid): even within one lane,
    nested spans would double-count. An event is a leaf if no other
    event starts inside it."""
    lanes = defaultdict(list)
    for e in events:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in keep_lanes:
            lanes[(e["pid"], e.get("tid"))].append(e)
    leaves = []
    for evs in lanes.values():
        evs.sort(key=lambda e: (float(e.get("ts", 0)), -float(e.get("dur", 0))))
        for i, e in enumerate(evs):
            end = float(e.get("ts", 0)) + float(e.get("dur", 0))
            nxt = evs[i + 1] if i + 1 < len(evs) else None
            # sorted by start: the only candidate child starts right after
            if nxt is not None and float(nxt.get("ts", 0)) < end:
                continue  # has a child -> aggregate span
            leaves.append(e)
    return leaves


def summarize(events, lanes, steps: int = 1):
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in _leaf_events(events, lanes):
        name = e.get("name", "?")
        tot[name] += float(e.get("dur", 0.0))  # us
        cnt[name] += 1
    rows = [
        {"op": k, "ms_per_step": round(v / 1e3 / steps, 3),
         "calls": round(cnt[k] / steps, 1)}
        for k, v in tot.items()
    ]
    rows.sort(key=lambda r: -r["ms_per_step"])
    total = sum(r["ms_per_step"] for r in rows)
    return rows, total


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--steps", type=int, default=1,
                    help="profiled steps in the window (divide totals)")
    args = ap.parse_args(argv)

    path = find_trace_file(args.trace_dir)
    events = load_events(path)
    pids = device_pids(events)
    lanes = op_lanes(events, pids)
    if not lanes:
        # fall back: the lane with the most XLA-looking event names
        cand = defaultdict(int)
        for e in events:
            if e.get("ph") == "X" and re.search(
                r"fusion|dot|conv|copy|dynamic|reduce|%|loop_", e.get("name", "")
            ):
                cand[(e.get("pid"), e.get("tid"))] += 1
        if cand:
            lanes = {max(cand, key=cand.get)}
    rows, total = summarize(events, lanes, steps=max(args.steps, 1))
    print(json.dumps({"trace": path, "op_lanes": sorted(lanes),
                      "device_op_ms_per_step": round(total, 2)}))
    for r in rows[: args.top]:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
