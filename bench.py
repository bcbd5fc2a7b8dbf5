#!/usr/bin/env python3
"""Benchmarks. Default (driver contract): ONE JSON line with the
headline metric — Megapixels/sec/chip on tile->infer->stitch for the
flagship DeepLabV3+ (ResNet101, OS16) over a synthetic 10 MP photo.

Per-chip target implied by the BASELINE.json north star ("10 MP
end-to-end < 2 s on a v5e-8"): 10 / 2 / 8 = 0.625 MP/s/chip;
``vs_baseline`` = measured / target.

Modes:
  python bench.py                 # headline infer metric (driver runs this)
  python bench.py --mode pipeline # N-photo extract->infer->CRF->stitch
  python bench.py --mode crf      # CRF-refined single-image pipeline
  python bench.py --mode train    # train-step throughput (tiles/s)
  python bench.py --mode all      # every BASELINE.md row (one JSON/line)
  python bench.py --trace DIR     # capture a jax.profiler trace

All timings force completion with a device->host fetch (np.asarray):
jax.block_until_ready does NOT synchronize on the tunneled 'axon'
backend, so timings taken with it under-measure (this is why round-1
docs disagreed on the train number — 72.9 was dispatch-only, 46 was
synced).  BASELINE.md quotes `--mode all` output verbatim.
"""

import argparse
import contextlib
import json
import os
import sys
import time

TARGET_PER_CHIP = 10.0 / 2.0 / 8  # MP/s/chip north-star


def _init_backend_or_die(timeout_s=240):
    """Initialize the jax backend under a watchdog.

    The image's default backend is a TPU behind a tunnel
    (JAX_PLATFORMS=axon); when the relay grant is unavailable, device
    enumeration blocks indefinitely in a retry-sleep loop.  A healthy
    tunnel enumerates in seconds (the ~95 s first-fetch cost comes
    later), so fail fast with a diagnostic instead of silently eating
    the caller's whole time budget."""
    import threading
    done = threading.Event()
    box = {}

    def probe():
        import jax
        box["devices"] = jax.devices()
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s):
        print(f"bench: jax backend init did not complete in {timeout_s}s "
              "— TPU tunnel/relay unreachable?  (JAX_PLATFORMS="
              f"{os.environ.get('JAX_PLATFORMS', '')!r})", file=sys.stderr)
        os._exit(3)  # the probe thread is stuck; a plain exit would hang
    # persistent XLA compilation cache: a cold DeepLab canvas-program
    # compile costs ~500 s against the tunneled backend, a cached one
    # seconds (docs/PERF_ROUND3.md); no-op on CPU backends
    from pylc_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()
    return box["devices"]


def _fetch(x):
    """Force device completion via an actual D2H fetch (axon-safe)."""
    import numpy as np
    return np.asarray(x)


def build_segmenter(crf=False):
    import jax
    from pylc_tpu.config import Config
    from pylc_tpu.infer import Segmenter
    from pylc_tpu.train_state import init_state, make_predict
    from pylc_tpu.models.registry import build_model

    cfg = Config().replace(arch="deeplab", backbone="resnet", ch=3,
                           norm_type="batch")
    state, _ = init_state(cfg, jax.random.PRNGKey(0))
    model_eval = build_model(cfg, train=False)
    predict = make_predict(cfg, model_eval)
    crf_fn = None
    if crf:
        from pylc_tpu.ops.crf import make_crf
        crf_fn = make_crf(cfg)
    return cfg, Segmenter(cfg, state, predict, batch_size=16, crf=crf_fn)


def synthetic_photo(cfg, mp_w=3872, mp_h=2592, seed=0):
    import numpy as np
    from pylc_tpu.utils.imageio import adjust_to_tile
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (mp_h, mp_w, 3)).astype(np.uint8)
    fitted, *_ = adjust_to_tile(img, cfg.tile_size, cfg.tile_size // 2)
    return fitted


def _median(xs):
    import statistics
    return statistics.median(xs)


def bench_infer(use_crf=False, repeats=6):
    # `value` is the MEDIAN of N runs (VERDICT r3 item 7): the tunneled
    # H2D link to the bench chip varies 3x run-to-run, so best-of-N is
    # the optimistic tail — the headline the driver parses must be the
    # honest central estimate.  `value_best` keeps the optimistic bound
    # (device compute is stable at ~152 ms/10MP photo), and `stages`
    # decomposes one representative run (h2d/compute/d2h/colourize, via
    # Segmenter.segment_array_staged) so the variance can be attributed
    # — the tunnel legs move, the compute leg doesn't.
    cfg, seg = build_segmenter(crf=use_crf)
    fitted = synthetic_photo(cfg)
    seg.segment_array(fitted)  # compile
    times = []
    for _ in range(repeats):
        res = seg.segment_array(fitted)  # segment_array fetches the mask
        times.append(res["seconds"])
    staged = seg.segment_array_staged(fitted)
    mp = res["megapixels"]
    mps = mp / _median(times)
    label = "tile->infer->CRF->stitch" if use_crf else "tile->infer->stitch"
    return {
        "metric": f"{label} throughput (DeepLabV3+/ResNet101, 10MP, "
                  "512px tiles, stride 256)",
        "value": round(mps, 3),
        "unit": "MP/s/chip",
        "vs_baseline": round(mps / TARGET_PER_CHIP, 3),
        "value_best": round(mp / min(times), 3),
        "seconds_best": round(min(times), 4),
        "seconds_median": round(_median(times), 4),
        "stages_s": {k: round(v, 4) for k, v in staged["stages"].items()},
    }


def bench_pipeline(n_photos=10, use_crf=True, repeats=3):
    """Batched pipeline (BASELINE.json config 5, scaled by --photos):
    distinct decoded photos through fit->tile->infer->CRF->stitch.

    Repeated ``repeats`` times; median is the headline and best rides
    along (VERDICT r3 item 7) because the tunnel H2D link (~30 MB/s, 3x
    run-to-run variance) is inside the pipelined wall — round 2
    published a single draw ("4.1-10.1 MP/s across runs"), which
    VERDICT r2 item 5 correctly called an unbounded error bar.  A staged
    single-photo decomposition rides along so the moving leg is
    identifiable."""
    cfg, seg = build_segmenter(crf=use_crf)
    photos = [synthetic_photo(cfg, seed=i) for i in range(n_photos)]
    seg.segment_array(photos[0])  # compile once (same canvas shape)
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        results = seg.segment_many(photos)  # pipelined H2D/compute/D2H
        dt = time.perf_counter() - t0
        mp = sum(r["megapixels"] for r in results)
        rates.append(mp / dt)
    staged = seg.segment_array_staged(photos[0])
    return {
        "metric": f"batched pipeline ({n_photos} photos, "
                  f"CRF={'on' if use_crf else 'off'})",
        "value": round(_median(rates), 3),
        "unit": "MP/s/chip",
        "vs_baseline": round(_median(rates) / TARGET_PER_CHIP, 3),
        "value_best": round(max(rates), 3),
        "stages_s": {k: round(v, 4) for k, v in staged["stages"].items()},
    }


def bench_train(steps=20, batch=8):
    import jax
    import numpy as np
    from pylc_tpu.config import Config
    from pylc_tpu.train_state import (init_state, make_step_key,
                                      make_train_step)

    cfg = Config().replace(arch="deeplab", backbone="resnet", ch=3,
                           batch_size=batch)
    state, model = init_state(cfg, jax.random.PRNGKey(0), 100)
    step = make_train_step(cfg, model)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (batch, 512, 512, 3)).astype(np.uint8)
    mask = rng.integers(0, cfg.n_classes, (batch, 512, 512)).astype(np.uint8)
    # device-resident batch: measures the step itself, as fed by the
    # trainer's async device_put pipeline (a host->device copy inside
    # the timed loop would measure the ~30 MB/s tunnel, not the chip)
    img = jax.device_put(img)
    mask = jax.device_put(mask)
    key = make_step_key(0, cfg.rng_impl)
    state, m = step(state, img, mask, key)  # compile
    _fetch(m["total"])
    # steady-state warmup: the first dispatches after compile carry ~2 s
    # of one-time setup on the tunnel link (measured: wall(n) = 2.1 s +
    # 45 ms*n); without this, short runs under-report by 2-7x
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, m = step(state, img, mask, sub)
    _fetch(m["total"])
    t0 = time.perf_counter()
    for _ in range(steps):
        key, sub = jax.random.split(key)
        state, m = step(state, img, mask, sub)
    _fetch(m["total"])  # actual D2H sync (axon-safe)
    dt = time.perf_counter() - t0
    tiles_s = steps * batch / dt
    return {
        "metric": f"train-step throughput (DeepLabV3+/ResNet101, "
                  f"batch {batch}, 512px)",
        "value": round(tiles_s, 3),
        "unit": "tiles/s/chip",
        "vs_baseline": round(tiles_s / 8.0, 3),  # ref config: batch 8 / step
    }


def _train_db_file(n_tiles=256, tile=512, path="/tmp/pylc_bench_db.h5"):
    """Build (once) a realistic gzip-chunked .h5: band-structured tiles
    with sensor noise — compresses like photographic content, unlike
    iid random bytes (which would make gzip the only bottleneck)."""
    import numpy as np
    if os.path.exists(path):
        return path
    from pylc_tpu.config import Config
    from pylc_tpu.db.database import TileDB
    rng = np.random.default_rng(0)
    imgs = np.empty((n_tiles, 3, tile, tile), np.uint8)
    masks = np.empty((n_tiles, tile, tile), np.uint8)
    for i in range(n_tiles):
        cmap = ((np.arange(tile) * 9 // tile) + i) % 9
        base = (cmap.astype(np.float32) * 24.0) + 20.0
        img = base[None, :] + rng.normal(0, 12, (3, tile, tile))
        imgs[i] = np.clip(img, 0, 255).astype(np.uint8)
        masks[i] = np.broadcast_to(cmap.astype(np.uint8), (tile, tile))
    cfg = Config().replace(ch=3, tile_size=tile, n_tiles=n_tiles)
    TileDB.save(path, imgs, masks, cfg)
    return path


def bench_train_db(batch=8, epochs=2):
    """Sustained training throughput FED FROM A REAL gzip .h5 through
    TileDataset prefetch + device placement (VERDICT r3 item 3: the
    plain train bench pins one device-resident batch and says nothing
    about whether the input pipeline can keep the chip fed).

    Reports steps/s sustained, the device-resident floor, and an
    attribution split: host-only pipeline rate (HDF5 gzip read +
    shuffle, no device) and H2D-only rate (device_put + sync), so a
    gap between sustained and floor is assignable to host vs link.
    Reference analogue: Buffer/worker chunk loading
    (/root/reference/db/buffer.py:67-92, db/database.py:129-149)."""
    import jax
    import numpy as np
    from pylc_tpu.config import Config
    from pylc_tpu.db.database import TileDB
    from pylc_tpu.db.dataset import TileDataset
    from pylc_tpu.train_state import (init_state, make_step_key,
                                      make_train_step)

    path = _train_db_file()
    db = TileDB(path)
    cfg = Config().replace(arch="deeplab", backbone="resnet", ch=3,
                           batch_size=batch)
    state, model = init_state(cfg, jax.random.PRNGKey(0), 100)
    step = make_train_step(cfg, model)
    key = make_step_key(0, cfg.rng_impl)

    ds = TileDataset(db, batch_size=batch, shuffle=True, drop_last=True,
                     chunk_size=64)

    # compile + device floor on one device-resident batch
    img0, mask0 = next(iter(ds))
    di, dm = jax.device_put(img0), jax.device_put(mask0)
    state, m = step(state, di, dm, key)
    _fetch(m["total"])
    t0 = time.perf_counter()
    for _ in range(10):
        key, sub = jax.random.split(key)
        state, m = step(state, di, dm, sub)
    _fetch(m["total"])
    floor_sps = 10 / (time.perf_counter() - t0)

    # host-only pipeline rate (no device work)
    t0 = time.perf_counter()
    n_host = sum(1 for _ in ds)
    host_sps = n_host / (time.perf_counter() - t0)

    # H2D-only rate (place every batch, force materialization)
    t0 = time.perf_counter()
    n_h2d = 0
    for img, mask in ds:
        di2, dm2 = jax.device_put(img), jax.device_put(mask)
        n_h2d += 1
    _fetch(dm2)
    _fetch(di2[0, 0, 0, :4])
    h2d_sps = n_h2d / (time.perf_counter() - t0)

    # sustained: full feed -> step loop, epochs x
    t0 = time.perf_counter()
    n_steps = 0
    for _ in range(epochs):
        for img, mask in ds:
            key, sub = jax.random.split(key)
            state, m = step(state, jax.device_put(img),
                            jax.device_put(mask), sub)
            n_steps += 1
    _fetch(m["total"])
    sustained_sps = n_steps / (time.perf_counter() - t0)

    return {
        "metric": f"sustained train steps/s from gzip .h5 "
                  f"(DeepLabV3+/ResNet101, batch {batch}, 512px, "
                  f"{db.size} tiles)",
        "value": round(sustained_sps, 3),
        "unit": "steps/s",
        "vs_baseline": round(sustained_sps / floor_sps, 3),
        "device_floor_sps": round(floor_sps, 3),
        "host_pipeline_sps": round(host_sps, 3),
        "h2d_sps": round(h2d_sps, 3),
        "tiles_s": round(sustained_sps * batch, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="infer",
                    choices=("infer", "crf", "pipeline", "train",
                             "train_db", "all"))
    ap.add_argument("--photos", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--trace", default=None, metavar="DIR")
    args = ap.parse_args()

    if os.environ.get("PYLC_BENCH_CRASH_FOR_TEST"):
        # test hook: lets the suite exercise the real crash->JSON guard
        # below without a real device failure (tests/test_bench.py)
        raise ValueError(os.environ["PYLC_BENCH_CRASH_FOR_TEST"])

    _init_backend_or_die()

    ctx = contextlib.nullcontext()
    if args.trace:
        from pylc_tpu.utils.tracing import trace
        ctx = trace(args.trace)

    with ctx:
        if args.mode == "infer":
            print(json.dumps(bench_infer()))
        elif args.mode == "crf":
            print(json.dumps(bench_infer(use_crf=True)))
        elif args.mode == "pipeline":
            print(json.dumps(bench_pipeline(args.photos)))
        elif args.mode == "train":
            print(json.dumps(bench_train(steps=args.steps,
                                         batch=args.batch)))
        elif args.mode == "train_db":
            print(json.dumps(bench_train_db(batch=args.batch)))
        else:  # all: every BASELINE.md row, pinned configs
            print(json.dumps(bench_infer()))
            print(json.dumps(bench_infer(use_crf=True)))
            print(json.dumps(bench_pipeline(args.photos)))
            print(json.dumps(bench_train(steps=args.steps, batch=8)))
            print(json.dumps(bench_train(steps=args.steps, batch=16)))
            print(json.dumps(bench_train_db(batch=8)))


if __name__ == "__main__":
    try:
        sys.exit(main())
    except SystemExit:
        raise
    except BaseException as e:
        # driver contract: ALWAYS leave one parseable JSON line, even on
        # a crash (a bare traceback records nothing for the round); the
        # traceback still goes to stderr and the exit stays nonzero
        print(json.dumps({
            "metric": "error", "value": 0.0, "unit": "",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:500],
        }))
        raise
