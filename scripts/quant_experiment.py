#!/usr/bin/env python3
"""int8 PTQ serving experiment on the real chip (VERDICT r4 item 7).

Protocol:
  1. Load the TRAINED flagship checkpoint from the cached differential
     parity experiment (scripts/ref_pipeline.py's DeepLab/ResNet101,
     reference-format .pth imported by pylc_tpu/convert.py) — a trained
     model gives confident, quantization-robust masks, unlike random
     init.
  2. Calibrate per-conv activation scales from the SAME experiment's
     extracted tile DB (pylc_tpu/quant.py) — dataset-derived, as a
     deployment would.
  3. Build two Segmenters over the identical canvas program scaffold:
     bf16 (shipping path) and int8 (make_predict_int8).
  4. Measure on the TPU: median wall + device-synced time per photo on
     the bench 10 MP-class synthetic photo, and argmax-mask agreement
     on the parity photos p0/p3 (real trained-content predictions).

Usage: python scripts/quant_experiment.py
Writes /tmp/quant_experiment.json; prints a summary.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def timed_segment(seg, fitted, repeats=6):
    """(median_wall, best_wall, median_COMPUTE, mp): wall rides the
    ~20-30 MB/s tunnel H2D; the staged compute stage is the chip-side
    number the PTQ claim is about (docs/PERF_ROUND5.md)."""
    seg.segment_array(fitted)  # compile
    times, comp = [], []
    for _ in range(repeats):
        r = seg.segment_array(fitted)  # includes real D2H fetch
        times.append(r["seconds"])
        comp.append(seg.segment_array_staged(fitted)["stages"]["compute"])
    return (statistics.median(times), min(times),
            statistics.median(comp), r["megapixels"])


def main():
    from bench import _init_backend_or_die, synthetic_photo
    _init_backend_or_die()
    import numpy as np

    import ref_pipeline as rp
    from pylc_tpu.config import Config
    from pylc_tpu.convert import load_pth_model
    from pylc_tpu.infer import Segmenter
    from pylc_tpu.models.registry import build_model
    from pylc_tpu.quant import (calibrate_absmax,
                                calibration_batches_from_db,
                                make_predict_int8)
    from pylc_tpu.utils.imageio import adjust_to_tile, get_image

    ref = rp.run()  # cached
    cfg, state, predict_f = load_pth_model(ref["model_pth"], Config())
    model_eval = build_model(cfg, train=False)

    # ---- calibration (eager, CPU-ish cost; a few dozen tiles) ------- #
    calib = calibration_batches_from_db(ref["db"], cfg, n_tiles=32, batch=8)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    scales = calibrate_absmax(model_eval, variables, calib, train=False)
    print(f"calibrated {len(scales)} convs from {ref['db']}", flush=True)

    seg_f = Segmenter(cfg, state, predict_f)
    seg_q = Segmenter(cfg, state, make_predict_int8(cfg, model_eval, scales))

    out = {"n_convs_calibrated": len(scales)}

    # ---- throughput on the bench photo ------------------------------ #
    fitted = synthetic_photo(cfg)
    med_f, best_f, comp_f, mp = timed_segment(seg_f, fitted)
    med_q, best_q, comp_q, _ = timed_segment(seg_q, fitted)
    out["throughput"] = {
        "mp": mp,
        "bf16_median_s": round(med_f, 4), "bf16_best_s": round(best_f, 4),
        "int8_median_s": round(med_q, 4), "int8_best_s": round(best_q, 4),
        "bf16_compute_s": round(comp_f, 4),
        "int8_compute_s": round(comp_q, 4),
        "bf16_mps": round(mp / med_f, 3), "int8_mps": round(mp / med_q, 3),
        "speedup_wall_median": round(med_f / med_q, 3),
        "speedup_compute": round(comp_f / comp_q, 3),
    }
    print(f"bf16: wall {med_f:.4f}s compute {comp_f:.4f}s  "
          f"int8: wall {med_q:.4f}s compute {comp_q:.4f}s  "
          f"compute speedup {comp_f / comp_q:.3f}x", flush=True)

    # ---- mask agreement on trained-content photos ------------------- #
    agreement = {}
    for img_name in ref["outputs"]:
        img, *_ = get_image(os.path.join(ref["raw_images"],
                                         f"{img_name}.jpg"),
                            cfg.ch, scale=1.0, tile_size=cfg.tile_size)
        photo, *_ = adjust_to_tile(img, cfg.tile_size, cfg.tile_size // 2)
        cm_f = seg_f.segment_array(photo)["class_map"]
        cm_q = seg_q.segment_array(photo)["class_map"]
        agreement[img_name] = round(float((cm_f == cm_q).mean()), 6)
        print(f"{img_name}: argmax agreement {agreement[img_name]:.4%}",
              flush=True)
    out["mask_agreement"] = agreement

    with open("/tmp/quant_experiment.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
