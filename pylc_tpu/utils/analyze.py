"""Analysis & visualization helpers (notebook-oriented).

Capability parity with reference utils/analyze.py (DB/model/output
loaders, legend/sample/profile/loss plotting) — but importable and
self-contained (the reference references undefined globals and is not
runnable as a module, analyze.py:84,356).  All plotting uses the Agg
backend so these work headless.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np

from pylc_tpu.config import Config
from pylc_tpu.db.database import TileDB


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


# --------------------------------------------------------------------- #
# loaders
# --------------------------------------------------------------------- #

def load_db(db_path: str) -> Tuple[TileDB, Config]:
    db = TileDB(db_path)
    return db, db.get_meta()


def load_losses(model_dir: str) -> dict:
    """Load a RunningLoss log (losses.json) from a model directory."""
    with open(os.path.join(model_dir, "losses.json")) as f:
        return json.load(f)


def load_output_mask(png_path: str) -> np.ndarray:
    import cv2
    img = cv2.imread(png_path, cv2.IMREAD_COLOR)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


# --------------------------------------------------------------------- #
# plots
# --------------------------------------------------------------------- #

def plot_legend(cfg: Config, out_path: Optional[str] = None):
    """Colour legend for the schema palette."""
    plt = _plt()
    n = cfg.n_classes
    fig, ax = plt.subplots(figsize=(4, 0.4 * n))
    for i in range(n):
        ax.barh(i, 1, color=np.asarray(cfg.palette_rgb[i]) / 255.0)
        ax.text(1.05, i, f"{cfg.class_codes[i]} — {cfg.class_labels[i]}",
                va="center", fontsize=9)
    ax.set_xlim(0, 2.5)
    ax.invert_yaxis()
    ax.axis("off")
    if out_path:
        fig.savefig(out_path, bbox_inches="tight", dpi=150)
        plt.close(fig)
        return out_path
    return fig


def plot_samples(db_path: str, n: int = 8, out_path: Optional[str] = None,
                 seed: int = 0):
    """Grid of image/mask tile pairs from a DB."""
    plt = _plt()
    db, meta = load_db(db_path)
    rng = np.random.default_rng(seed)
    idx = np.sort(rng.choice(db.size, size=min(n, db.size), replace=False))
    palette = np.asarray(meta.palette_rgb, np.uint8)
    fig, axes = plt.subplots(2, len(idx), figsize=(2 * len(idx), 4.2))
    for col, i in enumerate(idx):
        img, mask = db.read_chunk(int(i), int(i) + 1)
        im = np.transpose(img[0], (1, 2, 0))
        axes[0, col].imshow(im.squeeze(), cmap="gray" if meta.ch == 1
                            else None)
        axes[1, col].imshow(palette[mask[0]])
        axes[0, col].axis("off")
        axes[1, col].axis("off")
    axes[0, 0].set_title("image", loc="left", fontsize=9)
    axes[1, 0].set_title("mask", loc="left", fontsize=9)
    if out_path:
        fig.savefig(out_path, bbox_inches="tight", dpi=150)
        plt.close(fig)
        return out_path
    return fig


def plot_profile(cfg: Config, out_path: Optional[str] = None):
    """Class probability distribution + loss weights bar chart."""
    plt = _plt()
    probs = np.asarray(cfg.probs)
    weights = np.asarray(cfg.weights)
    x = np.arange(cfg.n_classes)
    fig, (a1, a2) = plt.subplots(1, 2, figsize=(10, 3.2))
    colors = [np.asarray(c) / 255.0 for c in cfg.palette_rgb]
    a1.bar(x, probs, color=colors)
    a1.axhline(1 / cfg.n_classes, ls="--", lw=1, color="k",
               label="balanced")
    a1.set_xticks(x, cfg.class_codes, rotation=45, fontsize=8)
    a1.set_title(f"pixel distribution (JSD {cfg.jsd:.3f}, M2 {cfg.m2:.3f})")
    a1.legend()
    a2.bar(x, weights, color=colors)
    a2.set_xticks(x, cfg.class_codes, rotation=45, fontsize=8)
    a2.set_title("CE class weights (1/log(1.02+p), max-normalized)")
    if out_path:
        fig.savefig(out_path, bbox_inches="tight", dpi=150)
        plt.close(fig)
        return out_path
    return fig


def plot_losses(model_dir: str, out_path: Optional[str] = None):
    """Training/validation loss curves from losses.json."""
    plt = _plt()
    d = load_losses(model_dir)
    fig, axes = plt.subplots(1, 3, figsize=(12, 3.2))
    names = ["ce", "dice", "focal"]
    for k, name in enumerate(names):
        for phase, style in (("train", "-"), ("valid", "o--")):
            rows = d.get(phase, [])
            if rows:
                it = [r[0] for r in rows]
                v = [r[k + 1] for r in rows]
                axes[k].plot(it, v, style, ms=3, label=phase)
        axes[k].set_title(name)
        axes[k].set_xlabel("iteration")
        axes[k].legend()
    if out_path:
        fig.savefig(out_path, bbox_inches="tight", dpi=150)
        plt.close(fig)
        return out_path
    return fig


def load_runs(model_dirs) -> list:
    """Loss logs for several model directories (multi-experiment
    comparison, reference analyze.py load_models/load_outputs
    capability).  Returns [{'name', 'losses'}] in input order."""
    return [{"name": os.path.basename(os.path.normpath(d)),
             "losses": load_losses(d)} for d in model_dirs]


def _smooth(v, k: int):
    """Centered moving average (the reference smooths train curves with
    a Savitzky-Golay filter; a moving average needs no scipy and reads
    the same at plot scale)."""
    v = np.asarray(v, np.float64)
    if k <= 1 or v.size < k:
        return v
    kern = np.ones(k) / k
    # edge-pad so the window never averages with implicit zeros (a
    # plain mode="same" convolve dips toward 0 at both ends)
    pad = k // 2
    vp = np.pad(v, (pad, k - 1 - pad), mode="edge")
    return np.convolve(vp, kern, mode="valid")


def plot_run_comparison(model_dirs, out_path: Optional[str] = None,
                        smooth: int = 9):
    """CE loss and mIoU (1 - dice) curves for several training runs on
    shared axes (reference analyze.py plot_eval capability): smoothed
    train curves as lines, validation points as markers."""
    plt = _plt()
    runs = load_runs(model_dirs)
    fig, (a_ce, a_iou) = plt.subplots(2, 1, figsize=(8, 6), sharex=True)
    markers = "sov^Dp*"
    for i, run in enumerate(runs):
        m = markers[i % len(markers)]
        for phase, ls in (("train", "-"), ("valid", "--")):
            rows = run["losses"].get(phase, [])
            if not rows:
                continue
            it = [r[0] for r in rows]
            ce = [r[1] for r in rows]
            miou = [1.0 - r[2] for r in rows]
            if phase == "train":
                a_ce.plot(it, _smooth(ce, smooth), ls, lw=1,
                          label=f"{run['name']} (train)")
                a_iou.plot(it, _smooth(miou, smooth), ls, lw=1,
                           label=f"{run['name']} (train)")
            else:
                a_ce.plot(it, ce, ls, marker=m, ms=4, lw=0.8,
                          label=f"{run['name']} (valid)")
                a_iou.plot(it, miou, ls, marker=m, ms=4, lw=0.8,
                           label=f"{run['name']} (valid)")
    a_ce.set_ylabel("CE loss")
    a_iou.set_ylabel("mIoU (1 - dice loss)")
    a_iou.set_xlabel("iteration")
    a_ce.legend(fontsize=7)
    if out_path:
        fig.savefig(out_path, bbox_inches="tight", dpi=150)
        plt.close(fig)
        return out_path
    return fig


def plot_grid_profiles(db_path: str, n: int = 25, n_cols: int = 5,
                       offset: int = 0, rates=None,
                       out_path: Optional[str] = None):
    """Per-tile class-distribution bar grid (reference analyze.py
    plot_grid_profiles capability): one histogram per tile in palette
    colours with the balanced line, optionally annotated with the
    augmentor's per-tile oversample ``rates``."""
    plt = _plt()
    db, meta = load_db(db_path)
    n = min(n, db.size - offset)
    n_rows = -(-n // n_cols)
    colors = [np.asarray(c) / 255.0 for c in meta.palette_rgb]
    fig, axes = plt.subplots(n_rows, n_cols, sharex=True, sharey=True,
                             figsize=(2.2 * n_cols, 1.8 * n_rows),
                             squeeze=False)
    x = np.arange(meta.n_classes)
    for k in range(n):
        ax = axes[k // n_cols][k % n_cols]
        _, mask = db.read_chunk(offset + k, offset + k + 1)
        dist = np.bincount(mask[0].ravel(), minlength=meta.n_classes)
        ax.bar(x, dist / dist.sum(), color=colors, alpha=0.8)
        ax.axhline(1 / meta.n_classes, ls="--", lw=0.8, color="k")
        title = f"#{offset + k}"
        if rates is not None:
            title += f" r={rates[offset + k]}"
        ax.set_title(title, fontsize=7)
        ax.set_xticks([])
    for k in range(n, n_rows * n_cols):
        axes[k // n_cols][k % n_cols].axis("off")
    if out_path:
        fig.savefig(out_path, bbox_inches="tight", dpi=150)
        plt.close(fig)
        return out_path
    return fig


def plot_eval_comparison(eval_json_paths, out_path: Optional[str] = None):
    """Grouped bar chart of F1 / wIoU / MCC across ``_eval.json``
    artifacts (the rebuild's eval-comparison analogue of the
    reference's multi-experiment plots)."""
    plt = _plt()
    names, scores = [], []
    for p in eval_json_paths:
        with open(p) as f:
            d = json.load(f)
        names.append(os.path.basename(p).replace("_eval.json", ""))
        scores.append([d.get("f1", 0), d.get("iou", 0), d.get("mcc", 0)])
    scores = np.asarray(scores)
    x = np.arange(len(names))
    w = 0.25
    fig, ax = plt.subplots(figsize=(1.2 * len(names) + 3, 3.2))
    for j, metric in enumerate(("F1", "wIoU", "MCC")):
        ax.bar(x + (j - 1) * w, scores[:, j], w, label=metric)
    ax.set_xticks(x, names, rotation=30, ha="right", fontsize=8)
    ax.set_ylim(0, 1)
    ax.legend()
    if out_path:
        fig.savefig(out_path, bbox_inches="tight", dpi=150)
        plt.close(fig)
        return out_path
    return fig


def compare_predictions(img_path: str, preds: dict,
                        out_path: Optional[str] = None):
    """Photo plus one predicted RGB mask per named experiment in one
    row (reference analyze.py plot_sample_comparison capability)."""
    plt = _plt()
    from pylc_tpu.utils.imageio import get_image
    img, *_ = get_image(img_path, ch=3)
    panels = [("photo", img)] + list(preds.items())
    fig, axes = plt.subplots(1, len(panels),
                             figsize=(4 * len(panels), 3.5))
    if len(panels) == 1:
        axes = [axes]
    for ax, (title, data) in zip(axes, panels):
        ax.imshow(data)
        ax.set_title(title, fontsize=9)
        ax.axis("off")
    if out_path:
        fig.savefig(out_path, bbox_inches="tight", dpi=150)
        plt.close(fig)
        return out_path
    return fig


def side_by_side(img_path: str, mask_rgb: np.ndarray,
                 mask_true_rgb: Optional[np.ndarray] = None,
                 out_path: Optional[str] = None):
    """Photo | prediction | (ground truth) comparison figure."""
    plt = _plt()
    from pylc_tpu.utils.imageio import get_image
    img, *_ = get_image(img_path, ch=3)
    panels = [("photo", img), ("prediction", mask_rgb)]
    if mask_true_rgb is not None:
        panels.append(("ground truth", mask_true_rgb))
    fig, axes = plt.subplots(1, len(panels),
                             figsize=(5 * len(panels), 4))
    if len(panels) == 1:
        axes = [axes]
    for ax, (title, data) in zip(axes, panels):
        ax.imshow(data)
        ax.set_title(title)
        ax.axis("off")
    if out_path:
        fig.savefig(out_path, bbox_inches="tight", dpi=150)
        plt.close(fig)
        return out_path
    return fig
