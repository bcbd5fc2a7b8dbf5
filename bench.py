#!/usr/bin/env python3
"""Benchmark: Megapixels/sec/chip on the tile->infer->stitch pipeline.

Runs the flagship DeepLabV3+ (ResNet101, OS16) over a synthetic 10 MP
photograph — the BASELINE.json north-star surface ("segment a 10 MP
oblique photo end-to-end in < 2 s on a v5e-8").  Per-chip target implied
by the north star: 10 MP / 2 s / 8 chips = 0.625 MP/s/chip;
``vs_baseline`` is measured MP/s/chip divided by that target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time


def main():
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from pylc_tpu.config import Config
    from pylc_tpu.infer import Segmenter
    from pylc_tpu.train_state import init_state, make_predict
    from pylc_tpu.models.registry import build_model
    from pylc_tpu.utils.imageio import adjust_to_tile

    cfg = Config().replace(arch="deeplab", backbone="resnet", ch=3,
                           norm_type="batch")
    state, _ = init_state(cfg, jax.random.PRNGKey(0))
    model_eval = build_model(cfg, train=False)
    predict = make_predict(cfg, model_eval)
    seg = Segmenter(cfg, state, predict, batch_size=8)

    # synthetic 10 MP photo (3872 x 2592 = 10.04 MP)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (2592, 3872, 3)).astype(np.uint8)
    fitted, w_fit, h_fit, _ = adjust_to_tile(img, cfg.tile_size,
                                             cfg.tile_size // 2)

    # warmup (compile)
    seg.segment_array(fitted)
    # timed runs
    times = []
    for _ in range(3):
        res = seg.segment_array(fitted)
        times.append(res["seconds"])
    dt = min(times)
    mp = res["megapixels"]
    n_chips = 1  # bench runs on the single available chip
    mps_per_chip = mp / dt / n_chips

    target_per_chip = 10.0 / 2.0 / 8  # north-star: 10 MP / 2 s / 8 chips
    print(json.dumps({
        "metric": "tile->infer->stitch throughput (DeepLabV3+/ResNet101, "
                  "10MP, 512px tiles, stride 256)",
        "value": round(mps_per_chip, 3),
        "unit": "MP/s/chip",
        "vs_baseline": round(mps_per_chip / target_per_chip, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
