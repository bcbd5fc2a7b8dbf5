"""Test mode: apply a trained model to images -> masks + metrics.

Flow parity with reference test.py:23-115: load model (meta rides in the
checkpoint), collate image(+mask) files, per image fit/tile/infer/stitch,
save colour mask PNG, evaluate vs ground truth, optional logits dump and
aggregate metrics.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax

from pylc_tpu.checkpoint import load_model_file
from pylc_tpu.config import Config
from pylc_tpu.evaluate import Evaluator
from pylc_tpu.infer import Segmenter
from pylc_tpu.train_state import init_state, make_predict
from pylc_tpu.models.registry import build_model
from pylc_tpu.utils.imageio import collate


def load_model(model_path: str, base_cfg: Optional[Config] = None):
    """Load a model artifact (.ckpt native; .pth via the converter).

    Returns (cfg, state, predict_fn)."""
    if not model_path or not os.path.exists(model_path):
        raise FileNotFoundError(f"Model file {model_path} does not exist.")

    if model_path.endswith(".pth"):
        from pylc_tpu.convert import load_pth_model
        return load_pth_model(model_path, base_cfg)

    import json
    meta_path = model_path + ".meta"
    cfg = base_cfg or Config()
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            cfg = Config.from_meta(json.load(f), base=cfg)
    state, _ = init_state(cfg, jax.random.PRNGKey(0))
    state, meta = load_model_file(model_path, state)
    if meta:
        cfg = Config.from_meta(meta, base=cfg)
    model_eval = build_model(cfg, train=False)
    return cfg, state, make_predict(cfg, model_eval)


def test(cfg: Config, model_path: str, img_path: str,
         mask_path: Optional[str] = None, scale: Optional[float] = None,
         save_logits: bool = False, aggregate_metrics: bool = False,
         use_crf: bool = False, verbose: bool = True,
         n_devices: Optional[int] = None) -> List[dict]:
    """Run the full test pipeline over one or more images.

    On a multi-chip host (e.g. a v5e-8) the tile batch and the stitched
    canvas are sharded over a 'data' mesh of all visible chips — the
    north-star benchmark surface (reference test.py:23-115 is
    single-GPU).  ``n_devices`` restricts the mesh (1 = force
    single-chip)."""
    cfg, state, predict = load_model(model_path, cfg)
    cfg.id = cfg.id or cfg.gen_model_id()

    crf = None
    if use_crf:
        from pylc_tpu.ops.crf import make_crf
        crf = make_crf(cfg)

    mesh = None
    n_mesh = n_devices if n_devices is not None else jax.device_count()
    if n_mesh > 1:
        from pylc_tpu.parallel.mesh import get_mesh
        mesh = get_mesh(n_mesh)
        if verbose:
            print(f"Inference mesh: {n_mesh} devices (sharded tile "
                  "batch + canvas stitch)")

    seg = Segmenter(cfg, state, predict, batch_size=16, crf=crf,
                    mesh=mesh)
    evaluator = Evaluator(cfg, keep_aggregate=aggregate_metrics)
    files = collate(img_path, mask_path)
    results = []

    # decode + grid-fit on a background thread pool sized by
    # --n_workers (the reference's DataLoader worker count,
    # reference utils/argparse.py "--n_workers"); the device pipeline
    # gets one-image lookahead via segment_stream
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    import cv2

    from pylc_tpu.utils.imageio import adjust_to_tile, get_image
    from pylc_tpu.ops.tiles import grid_dims

    stride = cfg.tile_size // 2
    n_workers = max(1, cfg.n_workers)

    def decode(fpair):
        if isinstance(fpair, dict):
            img_file, mask_file = fpair["img"], fpair["mask"]
        else:
            img_file, mask_file = fpair, None
        img, w_full, h_full, w_s, h_s = get_image(
            img_file, cfg.ch, scale=scale or cfg.scale,
            tile_size=cfg.tile_size)
        fitted, w_fit, h_fit, offset = adjust_to_tile(
            img, cfg.tile_size, stride)
        meta = {
            "img_file": img_file, "mask_file": mask_file,
            "w_full": w_full, "h_full": h_full,
            "w_scaled": w_s, "h_scaled": h_s,
            "w_fitted": w_fit, "h_fitted": h_fit,
            "offset": offset,
        }
        return meta, fitted

    def feed():
        # in-order results with a bounded decode lookahead (decoded
        # 10 MP images are ~30 MB each — don't decode the whole set)
        with ThreadPoolExecutor(max_workers=n_workers) as ex:
            futs: deque = deque()
            it = iter(files)
            done = False
            while True:
                while not done and len(futs) < n_workers + 2:
                    try:
                        futs.append(ex.submit(decode, next(it)))
                    except StopIteration:
                        done = True
                if not futs:
                    return
                yield futs.popleft().result()

    for meta, res in seg.segment_stream(feed(), stride=stride):
        img_file, mask_file = meta["img_file"], meta["mask_file"]
        nr, nc = grid_dims(meta["w_fitted"], meta["h_fitted"],
                           cfg.tile_size, stride)
        res["mask_rgb"] = cv2.resize(
            res["mask_rgb"], (meta["w_scaled"], meta["h_scaled"]),
            interpolation=cv2.INTER_NEAREST)
        res["extract"] = dict(meta, n=nr * nc,
                              fid=(img_file.split("/")[-1].replace(".", "_")
                                   + "_scale_" + str(scale or cfg.scale)))
        fid = res["extract"]["fid"]
        if verbose:
            mp = res["megapixels"]
            print(f"  {fid}: {mp:.1f} MP in {res['seconds']:.3f}s "
                  f"({mp / res['seconds']:.1f} MP/s)")

        evaluator.load(res["mask_rgb"], fid, mask_true_path=mask_file,
                       scale=scale)
        evaluator.save_image()
        if mask_file and not aggregate_metrics:
            evaluator.evaluate()
            evaluator.save_metrics()
            if verbose:
                m = evaluator.metrics.results
                print(f"    F1 {m['f1']:.4f}  IoU {m['iou']:.4f}  "
                      f"MCC {m['mcc']:.4f}")
        if save_logits:
            # the canvas class-probability map (the reference saves raw
            # per-tile logits, utils/evaluate.py:189-208; the stitched
            # probability canvas is this pipeline's equivalent artifact)
            evaluator.save_logits(res["probs"])
        results.append({"fid": fid, "seconds": res["seconds"],
                        "megapixels": res["megapixels"],
                        "metrics": dict(evaluator.metrics.results)})
        evaluator.reset()

    if aggregate_metrics:
        evaluator.evaluate(aggregate=True)
        evaluator.save_metrics()
        evaluator.save_tex()  # LaTeX table (reference utils/tex.py:20-100)
        results.append({"fid": "aggregate",
                        "metrics": dict(evaluator.metrics.results)})
    return results
