#!/usr/bin/env python3
"""Summarize a jax.profiler trace.

Usage: python scripts/analyze_trace.py /tmp/trace1 [top_n] [--module PREFIX]

Reads the chrome-trace json(.gz) files under
<dir>/plugins/profile/<run>/ and reports:

1. per-step device time for the jitted module whose name starts with
   PREFIX (default ``jit_step``, the train step) — the number BASELINE.md
   quotes ("device ms/step"), computed from "XLA Modules" spans so
   tunnel/host overhead is excluded;
2. an HLO-category breakdown of the ops inside those spans with
   achieved TF/s per category (MFU = TF/s / 197 bf16 peak on v5e);
3. the top ops by total device time across all device tracks (the
   round-1 style flat view, useful when no module matches).

This is the analysis behind docs/ASPP_PROFILE.md and
docs/PERF_ROUND3.md.
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict


def load_events(trace_dir):
    pats = [os.path.join(trace_dir, "**", "*.trace.json.gz"),
            os.path.join(trace_dir, "**", "*.trace.json")]
    files = sorted({f for p in pats for f in glob.glob(p, recursive=True)})
    if not files:
        raise SystemExit(f"no trace.json(.gz) under {trace_dir}")
    events, proc_meta, thread_meta = [], {}, {}
    for f in files:
        op = gzip.open if f.endswith(".gz") else open
        with op(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M":
                if ev.get("name") == "process_name":
                    proc_meta[ev["pid"]] = ev["args"].get("name", "")
                elif ev.get("name") == "thread_name":
                    thread_meta[(ev.get("pid"), ev.get("tid"))] = \
                        ev["args"].get("name", "")
                continue
            if ev.get("ph") == "X":
                events.append(ev)
    return events, proc_meta, thread_meta


def per_step_report(events, thread_meta, module_prefix):
    mods = [e for e in events
            if thread_meta.get((e.get("pid"), e.get("tid"))) == "XLA Modules"
            and e["name"].startswith(module_prefix)]
    if not mods:
        print(f"(no 'XLA Modules' spans starting with '{module_prefix}' — "
              "skipping per-step report)")
        return
    n = len(mods)
    tot = sum(e["dur"] for e in mods) / n * 1e-3
    print(f"\n== {module_prefix}: {n} executions, "
          f"device {tot:.2f} ms/step ==")
    windows = [(e["ts"], e["ts"] + e["dur"]) for e in mods]
    ops = [e for e in events
           if thread_meta.get((e.get("pid"), e.get("tid"))) == "XLA Ops"]
    agg = defaultdict(lambda: [0.0, 0.0])
    for e in ops:
        if not any(a <= e["ts"] < b for a, b in windows):
            continue
        args = e.get("args", {})
        cat = args.get("hlo_category", "?")
        agg[cat][0] += e["dur"] / n * 1e-3
        agg[cat][1] += float(args.get("model_flops", 0) or 0) / n
    print(f"{'ms/step':>9} {'TF/s':>7} {'MFU%':>5}  hlo category")
    for cat, (ms, fl) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:12]:
        tfs = fl / (ms * 1e-3) / 1e12 if ms else 0.0
        print(f"{ms:9.3f} {tfs:7.1f} {tfs / 197 * 100:5.1f}  {cat}")


def flat_report(events, proc_meta, top_n):
    device_pids = {pid for pid, name in proc_meta.items()
                   if re.search(r"TPU|/device|XLA", name, re.I)}
    by_name = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for ev in events:
        if device_pids and ev.get("pid") not in device_pids:
            continue
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        by_name[ev.get("name", "?")][0] += dur
        by_name[ev.get("name", "?")][1] += 1
        total += dur
    print(f"\n== flat: {len(events)} events, device total {total:.1f} ms "
          f"(all tracks if none matched) ==")
    print(f"{'ms':>10} {'calls':>6}  name")
    for name, (ms, n) in sorted(by_name.items(),
                                key=lambda kv: -kv[1][0])[:top_n]:
        print(f"{ms:10.2f} {n:6d}  {name[:110]}")


def main():
    argv = list(sys.argv[1:])
    module_prefix = "jit_step"
    if "--module" in argv:
        i = argv.index("--module")
        module_prefix = argv[i + 1]
        del argv[i:i + 2]
    trace_dir = argv[0]
    top_n = int(argv[1]) if len(argv) > 1 else 25
    events, proc_meta, thread_meta = load_events(trace_dir)
    print("process tracks:", {pid: proc_meta[pid] for pid in proc_meta})
    per_step_report(events, thread_meta, module_prefix)
    flat_report(events, proc_meta, top_n)


if __name__ == "__main__":
    main()
