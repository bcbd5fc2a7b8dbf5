#!/usr/bin/env python3
"""Measure the CRF accuracy-vs-throughput frontier behind the
``crf_downsample`` default (docs/CRF_TUNING.md, VERDICT r2 item 4).

Two axes, one row per downsample in {1, 2, 4}:
  - quality: mean mIoU delta (refined - unary) over N seeded textured
    scenes (pylc_tpu.utils.synthetic — curved boundaries, textured
    interiors, illumination gradient).  Backend-independent; runs
    anywhere (use JAX_PLATFORMS=cpu for speed off-TPU).
  - throughput: wall seconds for one refined 10 MP canvas (C=9
    classes, the flagship schema) on the *current* backend — run this
    leg on the real chip for the published numbers.

Usage:
  JAX_PLATFORMS=cpu python scripts/crf_frontier.py --quality-only
  python scripts/crf_frontier.py --throughput-only   # on the TPU
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def quality(downsamples, n_scenes=4, size=256, n_classes=5):
    import jax.numpy as jnp
    from pylc_tpu.ops.crf import CRFParams, mean_field
    from pylc_tpu.utils.synthetic import miou, textured_scene

    rows = {ds: [] for ds in downsamples}
    base = []
    for seed in range(n_scenes):
        rng = np.random.default_rng(seed)
        true, guide, probs = textured_scene(size, size, n_classes, rng)
        before = miou(np.argmax(probs, -1), true, n_classes)
        base.append(before)
        for ds in downsamples:
            out = np.asarray(mean_field(
                jnp.asarray(probs), jnp.asarray(guide),
                CRFParams(downsample=ds)))
            rows[ds].append(miou(np.argmax(out, -1), true, n_classes))
    return {
        "unary_miou": float(np.mean(base)),
        "refined_miou": {ds: float(np.mean(v)) for ds, v in rows.items()},
        "n_scenes": n_scenes, "size": size, "n_classes": n_classes,
    }


def throughput(downsamples, H=2592, W=3872, C=9, repeats=3):
    import jax
    import jax.numpy as jnp
    from pylc_tpu.ops.crf import CRFParams, mean_field

    rng = np.random.default_rng(0)
    probs = jnp.asarray(rng.random((H, W, C)).astype(np.float32))
    probs = probs / probs.sum(-1, keepdims=True)
    guide = jnp.asarray(
        rng.integers(0, 256, (H, W, 3)).astype(np.uint8))
    mp = H * W / 1e6
    out = {}
    for ds in downsamples:
        p = CRFParams(downsample=ds)
        r = np.asarray(mean_field(probs, guide, p))  # compile + run
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            r = mean_field(probs, guide, p)
            np.asarray(r[0, 0])  # real D2H sync (axon-safe)
            times.append(time.perf_counter() - t0)
        out[ds] = {"seconds": round(min(times), 4),
                   "mp_per_s": round(mp / min(times), 3)}
    return {"canvas": [H, W, C], "megapixels": round(mp, 2),
            "throughput": out, "backend": jax.default_backend()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quality-only", action="store_true")
    ap.add_argument("--throughput-only", action="store_true")
    ap.add_argument("--downsamples", type=int, nargs="+", default=[1, 2, 4])
    args = ap.parse_args()

    result = {}
    if not args.throughput_only:
        result["quality"] = quality(args.downsamples)
    if not args.quality_only:
        result["throughput"] = throughput(args.downsamples)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
