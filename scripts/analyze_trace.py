#!/usr/bin/env python3
"""Summarize a jax.profiler trace: top ops by total device time.

Usage: python scripts/analyze_trace.py /tmp/trace1 [top_n]

Reads the chrome-trace json(.gz) files under
<dir>/plugins/profile/<run>/ and aggregates complete events on device
tracks ('/device:TPU' or 'TPU' pids) by event name.
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
    events, meta = [], {}
    for f in files:
        op = gzip.open if f.endswith(".gz") else open
        with op(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M":
                if ev.get("name") == "process_name":
                    meta[ev["pid"]] = ev["args"].get("name", "")
                continue
            if ev.get("ph") == "X":
                events.append(ev)
    return events, meta


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    events, meta = load_events(trace_dir)
    device_pids = {pid for pid, name in meta.items()
                   if re.search(r"TPU|/device|XLA", name, re.I)}
    print("process tracks:", {pid: meta[pid] for pid in meta})

    by_name = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for ev in events:
        if device_pids and ev.get("pid") not in device_pids:
            continue
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        name = ev.get("name", "?")
        by_name[name][0] += dur
        by_name[name][1] += 1
        total += dur
    print(f"\n{len(events)} events, device total {total:.1f} ms "
          f"(all tracks if none matched)")
    print(f"{'ms':>10} {'calls':>6}  name")
    for name, (ms, n) in sorted(by_name.items(),
                                key=lambda kv: -kv[1][0])[:top_n]:
        print(f"{ms:10.2f} {n:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
