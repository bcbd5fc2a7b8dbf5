#!/usr/bin/env python3
"""Per-stage + per-op profiling of the INFERENCE canvas program on the
real chip (VERDICT r4 item 4 / weak #4): the headline BENCH metric
surface gets the same rigor the train step got in docs/PERF_ROUND3/4.

What it measures (flagship DeepLabV3+/ResNet101, 10 MP photo, 512 px
tiles, stride 256 — exactly bench.py's headline config):

1. **Differential stage decomposition** — three compiled variants of
   the canvas program, timed device-side (steady state, median of N):
     A  forward-only   unfold -> scan(forward+softmax)   [returns 1 elt]
     B  full headline  A + overlap stitch + argmax
     C  B + dense-CRF mean-field refinement
   stitch+argmax ~= B - A, CRF ~= C - B (fusion-boundary differences
   are second order next to these deltas).
2. **Batch-size sweep** — the B program at tile-batch 8/16/32
   (Segmenter default 16 was never swept on the chip).
3. **Trace category breakdown** — a jax.profiler trace of the B
   program, attributed by HLO category with conv MFU
   (scripts/analyze_trace.py machinery).

Usage:  python scripts/infer_profile.py [--trace /tmp/infer_trace]
Writes /tmp/infer_profile.json; prints a markdown-ready summary.
"""

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def _fetch1(x):
    """Force completion with a real 1-element D2H fetch (axon-safe)."""
    import numpy as np
    return np.asarray(x[(0,) * x.ndim]) if x.ndim else np.asarray(x)


def timed(fn, *args, repeats=6, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        _fetch1(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        _fetch1(out)
        times.append(time.perf_counter() - t0)
    return statistics.median(times), min(times), times


def build_variants(batch_size):
    import jax
    import jax.numpy as jnp

    from bench import build_segmenter, synthetic_photo
    from pylc_tpu.models.layers import resize_bilinear_align_corners
    from pylc_tpu.ops.tiles import grid_dims, stitch_probs, unfold_tiles
    from pylc_tpu.utils.compopts import tpu_compiler_options

    cfg, seg = build_segmenter(crf=True)
    seg.batch_size = batch_size
    fitted = synthetic_photo(cfg)
    H, W = fitted.shape[:2]
    tile, stride = cfg.tile_size, cfg.tile_size // 2
    n_rows, n_cols = grid_dims(W, H, tile, stride)
    n_tiles = n_rows * n_cols
    n_pad = (-n_tiles) % batch_size
    n_batches = (n_tiles + n_pad) // batch_size
    probs_dtype = jnp.bfloat16 if \
        n_tiles * tile * tile * cfg.n_classes * 4 > 256 * 2 ** 20 \
        else jnp.float32

    def forward_probs(state, batch_tiles):
        logits = seg.predict(state, batch_tiles)
        if logits.shape[1] != tile:
            logits = resize_bilinear_align_corners(logits, tile, tile)
        p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return p.astype(probs_dtype)

    def scan_probs(state, img):
        tiles = unfold_tiles(img, tile, stride)
        if n_pad:
            tiles = jnp.concatenate(
                [tiles, jnp.repeat(tiles[-1:], n_pad, axis=0)], axis=0)
        tiles = tiles.reshape((n_batches, batch_size) + tiles.shape[1:])

        def body(carry, bt):
            return carry, forward_probs(state, bt)

        _, probs = jax.lax.scan(body, 0, tiles)
        return probs.reshape((-1,) + probs.shape[2:])[:n_tiles]

    opts = tpu_compiler_options()

    @lambda f: jax.jit(f, compiler_options=opts)
    def run_A(state, img):  # forward only — tiny live output
        return scan_probs(state, img).sum(axis=(0, 1, 2))

    @lambda f: jax.jit(f, compiler_options=opts)
    def run_B(state, img):  # forward + stitch + argmax (headline)
        canvas = stitch_probs(scan_probs(state, img),
                              n_rows, n_cols, tile, stride)
        return jnp.argmax(canvas, axis=-1).astype(jnp.uint8)

    @lambda f: jax.jit(f, compiler_options=opts)
    def run_C(state, img):  # + CRF
        canvas = stitch_probs(scan_probs(state, img),
                              n_rows, n_cols, tile, stride)
        canvas = seg.crf(canvas, img)
        return jnp.argmax(canvas, axis=-1).astype(jnp.uint8)

    meta = {"H": H, "W": W, "n_tiles": n_tiles, "n_batches": n_batches,
            "probs_dtype": str(probs_dtype.__name__)}
    return cfg, seg, fitted, (run_A, run_B, run_C), meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None, metavar="DIR")
    ap.add_argument("--repeats", type=int, default=6)
    args = ap.parse_args()

    from bench import _init_backend_or_die
    _init_backend_or_die()
    import jax

    out = {"backend": jax.default_backend(),
           "device": str(jax.devices()[0])}

    # ---- stage decomposition at the default batch ------------------- #
    cfg, seg, fitted, (run_A, run_B, run_C), meta = build_variants(16)
    out["meta"] = meta
    dev = jax.device_put(fitted)
    _fetch1(dev)

    med_A, best_A, _ = timed(run_A, seg.state, dev, repeats=args.repeats)
    med_B, best_B, _ = timed(run_B, seg.state, dev, repeats=args.repeats)
    med_C, best_C, _ = timed(run_C, seg.state, dev, repeats=args.repeats)
    mp = meta["H"] * meta["W"] / 1e6
    out["stage_decomposition"] = {
        "mp": mp,
        "A_forward_s": round(med_A, 4),
        "B_full_s": round(med_B, 4),
        "C_crf_s": round(med_C, 4),
        "stitch_argmax_s": round(med_B - med_A, 4),
        "crf_s": round(med_C - med_B, 4),
        "best": {"A": round(best_A, 4), "B": round(best_B, 4),
                 "C": round(best_C, 4)},
    }
    print(f"A forward-only : {med_A:.4f}s  ({mp / med_A:.2f} MP/s)")
    print(f"B +stitch+argmax: {med_B:.4f}s  ({mp / med_B:.2f} MP/s)  "
          f"stitch+argmax ~= {med_B - med_A:.4f}s")
    print(f"C +CRF          : {med_C:.4f}s  ({mp / med_C:.2f} MP/s)  "
          f"CRF ~= {med_C - med_B:.4f}s", flush=True)

    # ---- batch sweep on the headline program ------------------------ #
    sweep = {}
    for bs in (4, 8, 16, 32, 64):
        _, seg_b, fitted_b, (_, rB, _), meta_b = build_variants(bs)
        dev_b = jax.device_put(fitted_b)
        _fetch1(dev_b)
        med, best, ts = timed(rB, seg_b.state, dev_b, repeats=args.repeats)
        sweep[bs] = {"median_s": round(med, 4), "best_s": round(best, 4),
                     "mps": round(mp / med, 3),
                     "n_batches": meta_b["n_batches"]}
        print(f"batch {bs:3d}: {med:.4f}s median ({mp / med:.2f} MP/s), "
              f"best {best:.4f}s", flush=True)
    out["batch_sweep"] = sweep

    # ---- optional device trace of the B program --------------------- #
    if args.trace:
        from pylc_tpu.utils.tracing import trace
        with trace(args.trace):
            for _ in range(3):
                r = run_B(seg.state, dev)
            _fetch1(r)
        out["trace_dir"] = args.trace
        print(f"trace written to {args.trace} — analyze with:\n"
              f"  python scripts/analyze_trace.py {args.trace} 30 "
              f"--module jit_run_B")

    with open("/tmp/infer_profile.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
