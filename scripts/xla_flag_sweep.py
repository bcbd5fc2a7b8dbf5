#!/usr/bin/env python3
"""Bounded XLA/libtpu flag sweep on the train step (VERDICT r3 item 8).

docs/PERF_ROUND3.md closed the MFU push at 62% with the note that the
remaining conv gap is "XLA conv-autotuner territory" — but only one
(nonexistent) VMEM flag was ever actually tried.  This script runs the
batch-8 DeepLab/ResNet101 train-step bench under a bounded set of
DOCUMENTED TPU scheduler/fusion flags, each in a fresh subprocess
(XLA flags are read at backend init), and emits a markdown table.

Flags that don't exist in this XLA/libtpu build fail fast with an
"Unknown flag"-style error; that outcome is recorded as `not-in-build`
rather than silently skipped — the point is a table of TRIED levers.

Usage: python scripts/xla_flag_sweep.py [--steps 30] [--out FILE.md]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Each entry: (name, {env var: value}).  XLA_FLAGS are appended to the
# inherited value; LIBTPU_INIT_ARGS replaces (it is unset by default).
CONFIGS = [
    ("baseline", {}),
    ("latency-hiding-scheduler-off",
     {"XLA_FLAGS": "--xla_tpu_enable_latency_hiding_scheduler=false"}),
    ("latency-hiding-scheduler-on",
     {"XLA_FLAGS": "--xla_tpu_enable_latency_hiding_scheduler=true"}),
    ("scheduler-rerun-2",
     {"XLA_FLAGS": "--xla_latency_hiding_scheduler_rerun=2"}),
    ("aggressive-loop-fusion-layout",
     {"XLA_FLAGS":
      "--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"}),
    ("experimental-fusion-cost-model",
     {"XLA_FLAGS":
      "--xla_tpu_enable_experimental_fusion_cost_model=true"}),
    ("licm-inflation-2x",
     {"XLA_FLAGS": "--xla_tpu_licm_size_inflation_ratio=2.0"}),
    ("async-copy-bw-2x",
     {"XLA_FLAGS":
      "--xla_tpu_async_copy_bandwidth_scaling_factor=2.0"}),
    ("multiple-core-program-split",
     {"XLA_FLAGS": "--xla_tpu_enable_multiple_core_program_split=true"}),
    ("all-experimental-scheduler",
     {"XLA_FLAGS":
      "--xla_tpu_enable_latency_hiding_scheduler=true "
      "--xla_latency_hiding_scheduler_rerun=2 "
      "--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"}),
]


def run_one(name, env_over, steps):
    env = dict(os.environ)
    for k, v in env_over.items():
        if k == "XLA_FLAGS" and env.get("XLA_FLAGS"):
            env["XLA_FLAGS"] = env["XLA_FLAGS"] + " " + v
        else:
            env[k] = v
    # a changed flag set invalidates the persistent compile cache entry
    # anyway (flags key the cache), so leave the cache on
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--mode",
         "train", "--steps", str(steps), "--batch", "8"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=3600)
    wall = time.time() - t0
    if p.returncode != 0:
        err = (p.stderr or p.stdout).strip().splitlines()
        tail = err[-1] if err else "?"
        kind = "not-in-build" if ("Unknown" in tail or "unknown" in tail
                                  or "Invalid" in tail) else "error"
        return {"name": name, "status": kind, "detail": tail[-160:],
                "wall_s": round(wall, 1)}
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    return {"name": name, "status": "ok",
            "tiles_s": rec["value"],
            "ms_step": round(8.0 / rec["value"] * 1000, 2),
            "wall_s": round(wall, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None,
                    help="comma-separated config names")
    args = ap.parse_args()

    rows = []
    names = args.only.split(",") if args.only else None
    for name, env_over in CONFIGS:
        if names and name not in names:
            continue
        print(f"--- {name}", flush=True)
        rec = run_one(name, env_over, args.steps)
        print(json.dumps(rec), flush=True)
        rows.append(rec)

    md = ["| config | status | tiles/s | ms/step | note |",
          "|---|---|---|---|---|"]
    for r in rows:
        md.append("| {} | {} | {} | {} | {} |".format(
            r["name"], r["status"], r.get("tiles_s", ""),
            r.get("ms_step", ""), r.get("detail", "")))
    table = "\n".join(md)
    print(table)
    if args.out:
        with open(args.out, "w") as f:
            f.write(table + "\n")


if __name__ == "__main__":
    main()
