#!/usr/bin/env python3
"""TPU compiler-flag sweep via PJRT ``compiler_options`` (VERDICT r3 item 8).

``scripts/xla_flag_sweep.py`` (the env-var form) established that on the
tunneled axon backend EVERY ``--xla_tpu_*`` flag is "Unknown flag in
XLA_FLAGS": the local process has no libtpu (compilation happens in the
remote ``tpu_compile_helper``), so env flags never reach the TPU
compiler.  The channel that DOES reach it is JAX's
``lowered.compile(compiler_options=...)``, which rides the PJRT compile
request: probing shows ``xla_tpu_enable_latency_hiding_scheduler`` is
accepted while a bogus option is rejected server-side (HTTP 500), i.e.
options are validated and applied remotely.

This script times the batch-8 DeepLab/ResNet101 train step compiled
under a bounded set of documented TPU scheduler/fusion/VMEM options.
Unknown-in-build options surface as a remote compile error and are
recorded as ``not-in-build``; the point is a table of TRIED levers.

Usage: python scripts/compiler_options_sweep.py [--steps 50] [--out F.md]
"""

import argparse
import json
import time

CONFIGS = [
    ("baseline", None),
    ("lhs-on", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("lhs-off", {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
    ("lhs-rerun-2", {"xla_tpu_enable_latency_hiding_scheduler": "true",
                     "xla_latency_hiding_scheduler_rerun": "2"}),
    ("aggressive-loop-fusion-layout",
     {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"}),
    ("experimental-fusion-cost-model",
     {"xla_tpu_use_experimental_fusion_cost_model": "true"}),
    ("licm-inflation-2x", {"xla_tpu_licm_size_inflation_ratio": "2.0"}),
    ("async-copy-bw-2x",
     {"xla_tpu_async_copy_bandwidth_scaling_factor": "2.0"}),
    ("scoped-vmem-32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("scoped-vmem-64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    # The first three sweep runs showed EVERY explicit-options config
    # ~2 ms/step faster than "baseline" — including lhs-off, which
    # shouldn't move anything.  baseline always ran first, so the gap
    # may be a cold-start ordering artifact: re-measure no-options at
    # the END of the sweep to separate option effects from order.
    ("combined-lhs-asynccopy",
     {"xla_tpu_enable_latency_hiding_scheduler": "true",
      "xla_tpu_async_copy_bandwidth_scaling_factor": "2.0"}),
    ("baseline-recheck", None),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import jax
    import numpy as np
    from pylc_tpu.config import Config
    from pylc_tpu.train_state import (init_state, make_step_key,
                                      make_train_step)
    # cache deliberately OFF: whether its key covers compiler_options is
    # exactly the kind of assumption that would silently hand every
    # config the baseline executable; per-config compile_s rides along
    # as the freshness witness

    batch = 8
    cfg = Config().replace(arch="deeplab", backbone="resnet", ch=3,
                           batch_size=batch)
    state0, model = init_state(cfg, jax.random.PRNGKey(0), 100)
    step = make_train_step(cfg, model)
    rng = np.random.default_rng(0)
    img = jax.device_put(
        rng.integers(0, 255, (batch, 512, 512, 3)).astype(np.uint8))
    mask = jax.device_put(
        rng.integers(0, cfg.n_classes, (batch, 512, 512)).astype(np.uint8))
    key = make_step_key(0, cfg.rng_impl)

    # Hold the step's donated operands on host so every config starts
    # from identical fresh device buffers.
    host_state = jax.tree.map(np.asarray, state0)

    lowered = step.lower(state0, img, mask, key)

    def fetch(x):
        np.asarray(jax.device_get(x))

    rows = []
    names = args.only.split(",") if args.only else None
    for name, opts in CONFIGS:
        if names and name not in names:
            continue
        print(f"--- {name} {opts}", flush=True)
        t0 = time.time()
        try:
            compiled = (lowered.compile() if opts is None
                        else lowered.compile(compiler_options=opts))
        except Exception as e:  # remote compile rejection
            msg = str(e)
            kind = ("not-in-build" if "500" in msg or "Unknown" in msg
                    else "error")
            rec = {"name": name, "status": kind,
                   "detail": msg.replace("\n", " ")[:160],
                   "compile_s": round(time.time() - t0, 1)}
            print(json.dumps(rec), flush=True)
            rows.append(rec)
            continue
        compile_s = time.time() - t0
        st = jax.device_put(host_state)
        k = key
        st, m = compiled(st, img, mask, k)
        fetch(m["total"])
        for _ in range(3):  # steady-state warmup (see bench.py)
            k, sub = jax.random.split(k)
            st, m = compiled(st, img, mask, sub)
        fetch(m["total"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            k, sub = jax.random.split(k)
            st, m = compiled(st, img, mask, sub)
        fetch(m["total"])
        dt = time.perf_counter() - t0
        rec = {"name": name, "status": "ok",
               "ms_step": round(dt / args.steps * 1000, 2),
               "tiles_s": round(args.steps * batch / dt, 1),
               "compile_s": round(compile_s, 1)}
        print(json.dumps(rec), flush=True)
        rows.append(rec)

    md = ["| config | status | ms/step | tiles/s | compile s | note |",
          "|---|---|---|---|---|---|"]
    for r in rows:
        md.append("| {} | {} | {} | {} | {} | {} |".format(
            r["name"], r["status"], r.get("ms_step", ""),
            r.get("tiles_s", ""), r.get("compile_s", ""),
            r.get("detail", "")))
    table = "\n".join(md)
    print(table)
    if args.out:
        with open(args.out, "w") as f:
            f.write(table + "\n")


if __name__ == "__main__":
    main()
