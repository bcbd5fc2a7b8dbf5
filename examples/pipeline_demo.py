#!/usr/bin/env python3
"""End-to-end pipeline demo (script form of the reference's Colab
notebook pylc_gpu.ipynb): synthesize (or point at) an image/mask corpus,
extract -> profile -> augment -> train -> test -> visualize.

Run:  python examples/pipeline_demo.py [--workdir DIR] [--real IMG_DIR MASK_DIR]
"""

import argparse
import glob
import json
import os
import sys

import numpy as np


def synthesize(workdir: str, n: int = 10):
    import cv2
    from pylc_tpu.config import Schema, DEFAULT_SCHEMA
    img_dir = os.path.join(workdir, "raw/images")
    mask_dir = os.path.join(workdir, "raw/masks")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    schema = Schema.load(DEFAULT_SCHEMA)
    palette = np.asarray(schema.palette_rgb, np.uint8)
    rng = np.random.default_rng(0)
    for i in range(n):
        H, W = 512, 1024
        img = rng.integers(0, 256, (H, W, 3)).astype(np.uint8)
        cmap = np.broadcast_to(
            (np.arange(W) * schema.n_classes // W).astype(np.uint8), (H, W))
        cv2.imwrite(f"{img_dir}/photo{i}.jpg",
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        cv2.imwrite(f"{mask_dir}/photo{i}.png",
                    cv2.cvtColor(palette[cmap], cv2.COLOR_RGB2BGR))
    return img_dir, mask_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/pylc_demo")
    ap.add_argument("--real", nargs=2, metavar=("IMG_DIR", "MASK_DIR"))
    ap.add_argument("--epochs", type=int, default=1)
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    os.chdir(args.workdir)

    from pylc_tpu.config import Config
    from pylc_tpu.extract import Extractor
    from pylc_tpu.augment import Augmentor
    from pylc_tpu.trainer import train
    from pylc_tpu.tester import test
    from pylc_tpu.utils import analyze

    img_dir, mask_dir = args.real or synthesize(args.workdir)
    cfg = Config().replace(ch=3, n_epochs=args.epochs, arch="unet")

    print("== extract ==")
    ex = Extractor(cfg).load(img_dir, mask_dir)
    db_path = ex.extract().coshuffle().profile().save(args.workdir)
    analyze.plot_profile(ex.meta, os.path.join(args.workdir, "profile.png"))
    analyze.plot_samples(db_path, 6, os.path.join(args.workdir,
                                                  "samples.png"))

    print("== augment ==")
    aug = Augmentor(cfg).load(db_path).optimize()
    print(f"   threshold {aug.optim_meta['threshold']:.2f} "
          f"rate_coef {aug.optim_meta['rate_coef']:.0f} "
          f"+{aug.optim_meta['aug_n_samples']} samples")
    if aug.optim_meta["aug_n_samples"]:
        db_path = aug.oversample().save(args.workdir)

    print("== train ==")
    summary = train(cfg, db_path)
    model_id = summary["model_id"]
    model_dir = os.path.join(cfg.save_dir, model_id)
    analyze.plot_losses(model_dir, os.path.join(args.workdir, "losses.png"))

    print("== test ==")
    first_img = sorted(glob.glob(os.path.join(img_dir, "*")))[0]
    stem = os.path.splitext(os.path.basename(first_img))[0]
    results = test(cfg, os.path.join(model_dir, model_id + ".ckpt"),
                   first_img,
                   mask_path=os.path.join(mask_dir, stem + ".png"))
    print(json.dumps(results[0]["metrics"].get("report", {}).get(
        "weighted avg", results[0]["metrics"]), indent=2, default=str))

    print("== export (hermetic serving artifact) ==")
    import numpy as np
    from pylc_tpu.export import ServingModel, save_artifact
    from pylc_tpu.infer import Segmenter
    from pylc_tpu.tester import load_model
    mcfg, state, predict = load_model(
        os.path.join(model_dir, model_id + ".ckpt"))
    seg = Segmenter(mcfg, state, predict, batch_size=16)
    Hs = Ws = 2 * mcfg.tile_size
    pylcx = os.path.join(args.workdir, "demo.pylcx")
    save_artifact(pylcx, seg, Hs, Ws)
    server = ServingModel.load(pylcx)  # needs no model code
    served = server.segment(np.zeros((Hs, Ws, mcfg.ch), np.uint8))
    print(f"   {pylcx}: serves {served['class_map'].shape} masks "
          f"on platforms {server.meta['platforms']}")

    print(f"\nArtifacts in {args.workdir}: profile.png samples.png "
          f"losses.png demo.pylcx + data/outputs/{model_id}/")


if __name__ == "__main__":
    sys.exit(main())
