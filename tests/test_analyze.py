"""Smoke tests for the analysis/visualization helpers.

The reference's utils/analyze.py is notebook-only and not runnable as
a module (undefined globals, analyze.py:84,356); here every helper is
importable and headless (Agg), so each capability row gets an artifact
test: the function runs on real pipeline outputs and writes a file.
"""

import json
import os

import numpy as np
import pytest

from pylc_tpu.config import Config, Schema, DEFAULT_SCHEMA

TILE = 64


@pytest.fixture(scope="module")
def small_db(tmp_path_factory):
    """2-image synthetic dataset extracted into a tile DB."""
    import cv2
    from pylc_tpu.extract import Extractor

    root = tmp_path_factory.mktemp("an")
    img_dir = root / "images"
    mask_dir = root / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    schema = Schema.load(DEFAULT_SCHEMA)
    palette = np.array(schema.palette_rgb, dtype=np.uint8)
    rng = np.random.default_rng(3)
    for i in range(2):
        H, W = 128, 192
        img = rng.integers(0, 256, (H, W, 3)).astype(np.uint8)
        classes = (np.arange(W) * schema.n_classes // W)
        cmap = np.broadcast_to(classes, (H, W)).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"a{i}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        cv2.imwrite(str(mask_dir / f"a{i}.png"),
                    cv2.cvtColor(palette[cmap], cv2.COLOR_RGB2BGR))
    cfg = Config().replace(tile_size=TILE, stride=TILE, ch=3,
                           buffer_size=16)
    ex = Extractor(cfg).load(str(img_dir), str(mask_dir))
    ex.extract(verbose=False).profile()
    path = ex.save(os.path.join(str(root), "db"))
    return path, str(root), str(img_dir)


def test_db_plots_write_artifacts(small_db, tmp_path):
    from pylc_tpu.utils import analyze as an

    path, _, _ = small_db
    _, meta = an.load_db(path)
    out = an.plot_legend(meta, str(tmp_path / "legend.png"))
    assert os.path.getsize(out) > 0
    out = an.plot_profile(meta, str(tmp_path / "profile.png"))
    assert os.path.getsize(out) > 0
    out = an.plot_samples(path, n=4, out_path=str(tmp_path / "s.png"))
    assert os.path.getsize(out) > 0
    out = an.plot_grid_profiles(path, n=6, n_cols=3,
                                out_path=str(tmp_path / "grid.png"))
    assert os.path.getsize(out) > 0


def test_run_and_loss_plots(tmp_path):
    """plot_losses on one run + plot_run_comparison across two runs,
    from synthesized RunningLoss logs (losses.json schema)."""
    from pylc_tpu.utils import analyze as an

    dirs = []
    rng = np.random.default_rng(0)
    for name in ("run_a", "run_b"):
        d = tmp_path / name
        d.mkdir()
        rows = [[int(i), float(2.0 / (1 + i) + rng.random() * .05),
                 float(0.9 - 0.02 * i), float(0.4 / (1 + i))]
                for i in range(1, 12)]
        with open(d / "losses.json", "w") as f:
            json.dump({"train": rows, "valid": rows[::4],
                       "lr": [[r[0], 1e-4] for r in rows]}, f)
        dirs.append(str(d))

    out = an.plot_losses(dirs[0], str(tmp_path / "one.png"))
    assert os.path.getsize(out) > 0
    runs = an.load_runs(dirs)
    assert [r["name"] for r in runs] == ["run_a", "run_b"]
    out = an.plot_run_comparison(dirs, str(tmp_path / "cmp.png"))
    assert os.path.getsize(out) > 0


def test_eval_comparison_and_prediction_panels(small_db, tmp_path):
    from pylc_tpu.utils import analyze as an

    _, _, img_dir = small_db
    paths = []
    for i, (f1, iou, mcc) in enumerate([(0.8, 0.7, 0.6), (0.9, 0.8, 0.7)]):
        p = tmp_path / f"m{i}_eval.json"
        with open(p, "w") as f:
            json.dump({"f1": f1, "iou": iou, "mcc": mcc, "report": {}}, f)
        paths.append(str(p))
    out = an.plot_eval_comparison(paths, str(tmp_path / "eval.png"))
    assert os.path.getsize(out) > 0

    img_path = os.path.join(img_dir, "a0.jpg")
    fake = np.zeros((128, 192, 3), np.uint8)
    fake[..., 1] = 200
    out = an.compare_predictions(
        img_path, {"exp1": fake, "exp2": fake[:, :, ::-1]},
        str(tmp_path / "preds.png"))
    assert os.path.getsize(out) > 0
    out = an.side_by_side(img_path, fake,
                          out_path=str(tmp_path / "sbs.png"))
    assert os.path.getsize(out) > 0
