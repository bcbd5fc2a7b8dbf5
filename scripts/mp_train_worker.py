#!/usr/bin/env python3
"""Worker process for the REAL multi-process (DCN-analogue) training
test (tests/test_multiprocess_train.py; VERDICT r3 item 4).

Each invocation is one `jax.distributed` process owning
``devices_per_proc`` virtual CPU devices; N workers form one global
mesh and run the FULL trainer (sharded TileDataset reads,
make_array_from_process_local_data placement, GSPMD sync-BN + grad
all-reduce, sharded validation, proc-0 checkpointing) — the path that
was only proxy-tested single-process before round 4.

Usage:
  mp_train_worker.py PROC_ID NUM_PROCS PORT DEVS_PER_PROC DB OUT_DIR

Writes OUT_DIR/params_PROC_ID.npz (flattened final params +
batch_stats + best_dice) for the test to diff across runs.
"""

import json
import os
import sys


def main():
    proc_id = int(sys.argv[1])
    num_procs = int(sys.argv[2])
    port = int(sys.argv[3])
    devs_per_proc = int(sys.argv[4])
    db_path = sys.argv[5]
    out_dir = sys.argv[6]

    # environment must be fixed BEFORE jax initializes a backend
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") +
        f" --xla_force_host_platform_device_count={devs_per_proc}").strip()
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # never dial the tunnel
    import jax
    jax.config.update("jax_platforms", "cpu")
    # in-process CPU collectives only rendezvous within one process;
    # cross-process needs the gloo transport
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from pylc_tpu.parallel.mesh import init_distributed
    if num_procs > 1:
        init_distributed(coordinator=f"127.0.0.1:{port}",
                         num_processes=num_procs, process_id=proc_id)
    assert jax.process_count() == num_procs
    assert jax.device_count() == num_procs * devs_per_proc

    # reuse/warm the suite's persistent compile cache (safe after
    # distributed init; per-host fingerprint namespaces the CPU cache)
    from pylc_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache(allow_cpu=True)

    from pylc_tpu.config import Config
    from pylc_tpu.trainer import train

    # shuffle=False makes the global batch ORDER process-count-invariant
    # (contiguous shards concatenate to the single-process stream), which
    # the equivalence test needs because dropout masks bind to batch
    # slots: with shuffling, 1-proc and N-proc runs pair different rows
    # with different dropout masks and the BN running stats legitimately
    # diverge at ~1e-2 (measured, docs/PERF_ROUND5.md) with no
    # placement-path bug involved.
    cfg = Config().replace(
        arch="deeplab", backbone="mobilenet", ch=3, tile_size=64,
        batch_size=8, n_epochs=2, norm_type="syncbatch",
        optim_type="sgd", compute_dtype="float32", n_workers=0,
        report=1, shuffle=False, save_dir=os.path.join(out_dir, "save"))
    summary = train(cfg, db_path, verbose=(proc_id == 0))

    import numpy as np
    state = summary["state"]
    flat = {}
    for prefix, tree in (("p", state.params), ("b", state.batch_stats)):
        leaves = jax.tree_util.tree_leaves_with_path(tree)
        for path, leaf in leaves:
            flat[prefix + jax.tree_util.keystr(path)] = np.asarray(leaf)
    flat["best_dice"] = np.float64(summary["best_dice"])
    np.savez(os.path.join(out_dir, f"params_{proc_id}.npz"), **flat)
    with open(os.path.join(out_dir, f"summary_{proc_id}.json"), "w") as f:
        json.dump({"model_id": summary["model_id"],
                   "steps": summary["steps"],
                   "best_dice": summary["best_dice"]}, f)
    print(f"worker {proc_id}/{num_procs}: done "
          f"({summary['steps']} steps, best_dice {summary['best_dice']})",
          flush=True)


if __name__ == "__main__":
    main()
