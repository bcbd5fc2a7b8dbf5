"""End-to-end slice: extract -> train -> test on synthetic data.

Exercises the full pipeline the way the reference's Colab notebook does
manually (SURVEY.md §4): synthetic image/mask pairs on disk, tile
extraction to an HDF5 DB, a short U-Net training run, then full-image
inference with stitching and evaluation.
"""

import os

import numpy as np
import pytest

from pylc_tpu.config import Config, Schema, DEFAULT_SCHEMA


TILE = 64


@pytest.fixture(scope="module")
def tiny_cfg():
    return Config().replace(
        tile_size=TILE, stride=TILE, input_size=TILE, output_size=24,
        unet_depth=3, unet_wf=3, arch="unet", ch=3, batch_size=4,
        n_epochs=1, buffer_size=64, dropout=0.0, report=4,
    )


@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    """Four 256x192 synthetic images + palette-exact masks on disk."""
    import cv2
    root = tmp_path_factory.mktemp("data")
    img_dir = root / "images"
    mask_dir = root / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    schema = Schema.load(DEFAULT_SCHEMA)
    palette = np.array(schema.palette_rgb, dtype=np.uint8)
    rng = np.random.default_rng(7)
    for i in range(4):
        H, W = 192, 256
        img = rng.integers(0, 256, (H, W, 3)).astype(np.uint8)
        # mask: vertical class bands -> exact palette colours
        classes = (np.arange(W) * schema.n_classes // W)
        cmap = np.broadcast_to(classes, (H, W)).astype(np.uint8)
        mask = palette[cmap]
        cv2.imwrite(str(img_dir / f"img{i}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 100])
        cv2.imwrite(str(mask_dir / f"img{i}.png"),
                    cv2.cvtColor(mask, cv2.COLOR_RGB2BGR))
    return str(img_dir), str(mask_dir), str(root)


@pytest.fixture(scope="module")
def extracted_db(synthetic_dataset, tiny_cfg):
    from pylc_tpu.extract import Extractor
    img_dir, mask_dir, root = synthetic_dataset
    ex = Extractor(tiny_cfg).load(img_dir, mask_dir)
    ex.extract(verbose=False).coshuffle().profile()
    path = ex.save(os.path.join(root, "db"))
    return path, root


def test_extract_creates_db_with_meta(extracted_db, tiny_cfg):
    from pylc_tpu.db.database import TileDB
    path, _ = extracted_db
    db = TileDB(path)
    meta = db.get_meta(base=tiny_cfg)
    # 4 images of 256x192 at tile 64 -> 4 * 4*3 = 48 tiles
    assert db.size == 48
    assert db.img_shape[1:] == (3, TILE, TILE)
    assert db.mask_shape[1:] == (TILE, TILE)
    assert meta.n_samples == 48
    assert len(meta.weights) == meta.n_classes
    assert meta.px_mean is not None
    # mask encoding sanity: class ids within range
    imgs, masks = db.read_chunk(0, 8)
    assert masks.max() < meta.n_classes


def test_train_and_infer_e2e(extracted_db, tiny_cfg, tmp_path):
    from pylc_tpu.trainer import train
    from pylc_tpu.tester import test as run_test
    path, root = extracted_db
    cfg = tiny_cfg.replace(
        save_dir=str(tmp_path / "save"), output_dir=str(tmp_path / "out"))
    summary = train(cfg, path, n_devices=1, verbose=False)
    assert summary["steps"] > 0
    assert np.isfinite(summary["best_dice"])

    model_file = os.path.join(cfg.save_dir, summary["model_id"],
                              summary["model_id"] + ".ckpt")
    assert os.path.exists(model_file), "best-model checkpoint missing"

    # full-image inference over one synthetic image + mask
    img_dir = os.path.join(root.replace("db", ""), "")
    results = run_test(
        cfg, model_file,
        img_path=os.path.join(os.path.dirname(path), "..", "images"),
        mask_path=os.path.join(os.path.dirname(path), "..", "masks"),
        scale=1.0, verbose=False)
    assert len(results) == 4
    for r in results[:1]:
        assert "f1" in r["metrics"]
        assert 0.0 <= r["metrics"]["f1"] <= 1.0
    # mask artifact written
    masks_dir = os.path.join(cfg.output_dir, cfg.gen_model_id(), "masks")
    masks = sorted(os.listdir(masks_dir))
    assert len(masks) == 4

    # production-path mesh parity: the run above used the default mesh
    # (8 virtual devices, conftest) — a forced single-chip run must
    # produce byte-identical mask PNGs (tester.py n_devices)
    import cv2
    mesh_mask = cv2.imread(os.path.join(masks_dir, masks[0]))
    cfg1 = cfg.replace(output_dir=str(tmp_path / "out_1dev"))
    run_test(cfg1, model_file,
             img_path=os.path.join(os.path.dirname(path), "..", "images"),
             mask_path=os.path.join(os.path.dirname(path), "..", "masks"),
             scale=1.0, verbose=False, n_devices=1)
    one_dir = os.path.join(cfg1.output_dir, cfg1.gen_model_id(), "masks")
    one_mask = cv2.imread(os.path.join(one_dir, masks[0]))
    assert np.array_equal(mesh_mask, one_mask), \
        "mesh vs single-device tester masks differ"


def test_checkpoint_resume_runs_full_epochs(extracted_db, tiny_cfg,
                                            tmp_path):
    """Resume must complete exactly n_epochs (the reference's
    range(offset, n-offset) bug shrank it, train.py:72)."""
    from pylc_tpu.trainer import train
    path, _ = extracted_db
    cfg = tiny_cfg.replace(
        save_dir=str(tmp_path / "save2"), output_dir=str(tmp_path / "out2"),
        n_epochs=1)
    train(cfg, path, n_devices=1, verbose=False)
    # resume for one more epoch
    cfg2 = cfg.replace(n_epochs=2, resume_checkpoint=True)
    summary = train(cfg2, path, n_devices=1, verbose=False)
    assert summary["epochs"] == 1  # epochs run after resume = 2 - 1


def test_db_meta_does_not_stomp_cli_arch(extracted_db, tiny_cfg):
    """Regression: --arch chosen at train time must survive metadata
    rehydration from a DB extracted under a different default arch."""
    from pylc_tpu.db.database import TileDB
    path, _ = extracted_db
    base = tiny_cfg.replace(arch="resunet", backbone="xception")
    cfg = TileDB(path).get_meta(base=base, data_only=True)
    assert cfg.arch == "resunet"          # user setting preserved
    assert cfg.backbone == "xception"
    assert cfg.n_samples == 48            # data facts rehydrated
    assert cfg.px_mean is not None


def test_validation_smaller_than_batch_still_tracks_best(extracted_db,
                                                         tiny_cfg, tmp_path):
    """Regression: a valid split smaller than the batch must still run
    validation (padded partial batch) and save the best model."""
    import json
    from pylc_tpu.trainer import train
    path, _ = extracted_db
    # 48 tiles -> valid split 9; batch 32 > 9 would starve with drop_last
    cfg = tiny_cfg.replace(
        save_dir=str(tmp_path / "save3"), output_dir=str(tmp_path / "out3"),
        batch_size=32, n_epochs=1)
    summary = train(cfg, path, n_devices=1, verbose=False)
    model_dir = os.path.join(cfg.save_dir, summary["model_id"])
    with open(os.path.join(model_dir, "losses.json")) as f:
        d = json.load(f)
    assert len(d["valid"]) >= 2          # initial + end-of-epoch
    assert d["best_dice"] < 1.0          # best actually tracked
    assert os.path.exists(os.path.join(
        model_dir, summary["model_id"] + ".ckpt"))


def test_multiscale_extraction(synthetic_dataset, tiny_cfg):
    """scales=[0.5, 1.0] extracts tiles at both pyramid levels
    (reference utils/extract.py:133 loops scales)."""
    from pylc_tpu.extract import Extractor
    img_dir, mask_dir, _ = synthetic_dataset
    cfg = tiny_cfg.replace(scales=[0.5, 1.0])
    ex = Extractor(cfg).load(img_dir, mask_dir).extract(verbose=False)
    # 256x192 at scale 1.0 -> 4x3 grid = 12 tiles; at 0.5 the min-dim
    # clamp (tools.py:139-145) keeps the 64px tiles extractable
    n_full = sum(len(t) for t in ex.imgs)
    assert n_full > 4 * 12  # both scales contributed
    assert ex.meta.n_tiles == n_full


def test_aggregate_metrics_and_tex(extracted_db, tiny_cfg, tmp_path, rng):
    """Aggregate evaluation pools all images (reference test.py:113-115)
    and the LaTeX artifact renders."""
    from pylc_tpu.evaluate import Evaluator
    from pylc_tpu.config import Schema, DEFAULT_SCHEMA
    schema = Schema.load(DEFAULT_SCHEMA)
    palette = np.array(schema.palette_rgb, np.uint8)
    cfg = tiny_cfg.replace(output_dir=str(tmp_path / "o"), id="agg")
    ev = Evaluator(cfg)
    for i in range(3):
        cm_true = rng.integers(0, 9, (32, 32)).astype(np.uint8)
        cm_pred = cm_true.copy()
        flip = rng.random((32, 32)) < 0.2
        cm_pred[flip] = (cm_pred[flip] + 1) % 9
        # route through the RGB path like the real pipeline
        import cv2
        tp = str(tmp_path / f"t{i}.png")
        cv2.imwrite(tp, cv2.cvtColor(palette[cm_true], cv2.COLOR_RGB2BGR))
        ev.load(palette[cm_pred], f"img{i}", mask_true_path=tp)
    ev.evaluate(aggregate=True)
    m = ev.metrics.results
    assert 0.7 < m["f1"] < 0.95      # 20% corruption
    assert ev.fid == "aggregate_metrics"
    tex = ev.save_tex()
    content = open(tex).read()
    assert "\\begin{table}" in content and "NC" in content
    # full reference tex.py capability: separated averages + footer
    # with pixel accuracy, aggregate scores, and total pixel count
    for token in ("cAvg", "wAvg", "Pixel Accuracy", "F1 Score", "wIoU",
                  "MCC", "Total Pixels"):
        assert token in content, f"missing {token!r} in tex export"


def test_seed_class_pixels_does_not_corrupt_aggregate(tiny_cfg, tmp_path):
    """Per-image evaluate(seed_class_pixels=True) must not leak the
    forced class pixels into a later evaluate(aggregate=True): load()
    appends the very same ndarray objects to y_*_aggregate, so seeding
    must copy first (VERDICT r3 item 9)."""
    import cv2
    from pylc_tpu.evaluate import Evaluator
    from pylc_tpu.config import Schema, DEFAULT_SCHEMA
    schema = Schema.load(DEFAULT_SCHEMA)
    palette = np.array(schema.palette_rgb, np.uint8)
    cfg = tiny_cfg.replace(output_dir=str(tmp_path / "o"), id="seed")
    ev = Evaluator(cfg)
    # ground truth and prediction are BOTH uniformly class 5: any other
    # class id appearing in the aggregate arrays is seed leakage
    cm = np.full((16, 16), 5, np.uint8)
    tp = str(tmp_path / "t.png")
    cv2.imwrite(tp, cv2.cvtColor(palette[cm], cv2.COLOR_RGB2BGR))
    for i in range(2):
        ev.load(palette[cm], f"img{i}", mask_true_path=tp)
        ev.evaluate(seed_class_pixels=True)  # reference-parity mode
        # the seeded copy itself must contain the forced class ids
        assert ev.y_true[0] == 0 and ev.y_true[8] == 8
    ev.evaluate(aggregate=True)
    assert np.all(ev.y_true == 5), "seeded pixels leaked into aggregate"
    assert np.all(ev.y_pred == 5)
    assert ev.metrics.results["f1"] == 1.0


def test_db_clip_fraction(extracted_db):
    """clip uses a fraction of the dataset (reference db/database.py:71)."""
    from pylc_tpu.db.database import TileDB
    path, _ = extracted_db
    db = TileDB(path, clip=0.5)
    assert db.size == 24  # half of 48
    full = TileDB(path)
    assert full.size == 48


def test_grayscale_pipeline_e2e(tmp_path, rng):
    """ch=1 end-to-end: extract grayscale -> train -> full-image test
    (half the published reference models are grayscale, README tables)."""
    import cv2
    from pylc_tpu.config import Schema, DEFAULT_SCHEMA
    from pylc_tpu.extract import Extractor
    from pylc_tpu.trainer import train
    from pylc_tpu.tester import test as run_test

    schema = Schema.load(DEFAULT_SCHEMA)
    palette = np.array(schema.palette_rgb, np.uint8)
    img_dir = tmp_path / "images"
    mask_dir = tmp_path / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    for i in range(3):
        H, W = 128, 192
        g = rng.integers(0, 256, (H, W)).astype(np.uint8)
        img = np.stack([g, g, g], -1)  # grayscale jpg (equal channels)
        cmap = np.broadcast_to((np.arange(W) * 9 // W).astype(np.uint8),
                               (H, W))
        cv2.imwrite(str(img_dir / f"g{i}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 100])
        cv2.imwrite(str(mask_dir / f"g{i}.png"),
                    cv2.cvtColor(palette[cmap], cv2.COLOR_RGB2BGR))

    cfg = Config().replace(
        ch=1, tile_size=TILE, stride=TILE, input_size=TILE, output_size=24,
        unet_depth=3, unet_wf=3, arch="unet", batch_size=4, n_epochs=1,
        buffer_size=64, dropout=0.0, report=4,
        save_dir=str(tmp_path / "save"), output_dir=str(tmp_path / "out"))

    ex = Extractor(cfg).load(str(img_dir), str(mask_dir))
    db = ex.extract(verbose=False).coshuffle().profile().save(str(tmp_path))
    from pylc_tpu.db.database import TileDB
    assert TileDB(db).img_shape[1] == 1  # single channel stored

    summary = train(cfg, db, n_devices=1, verbose=False)
    model = os.path.join(cfg.save_dir, summary["model_id"],
                         summary["model_id"] + ".ckpt")
    assert os.path.exists(model)
    results = run_test(cfg, model, str(img_dir / "g0.jpg"),
                       mask_path=str(mask_dir / "g0.png"), verbose=False)
    assert 0.0 <= results[0]["metrics"]["f1"] <= 1.0


def test_running_loss_weighted_average(tmp_path):
    """Validation pushes are weighted by real sample count so a partial
    final batch doesn't carry full-batch influence on best-dice."""
    from pylc_tpu.checkpoint import RunningLoss
    rl = RunningLoss("m", str(tmp_path))
    rl.push({"ce": 1.0, "dice": 0.2, "focal": 0.0}, weight=8.0)
    rl.push({"ce": 3.0, "dice": 1.0, "focal": 0.0}, weight=2.0)
    rl.log(1, training=False)
    assert abs(rl.avg_ce - (1.0 * 8 + 3.0 * 2) / 10) < 1e-9
    assert abs(rl.avg_dice - (0.2 * 8 + 1.0 * 2) / 10) < 1e-9
    # unweighted pushes behave as before (plain mean)
    rl.push({"ce": 1.0, "dice": 0.5, "focal": 0.0})
    rl.push({"ce": 2.0, "dice": 0.7, "focal": 0.0})
    rl.log(2, training=True)
    assert abs(rl.avg_ce - 1.5) < 1e-9


def test_pretrained_user_path_missing_fails_loudly(extracted_db, tiny_cfg,
                                                   tmp_path):
    """A user-supplied pretrained path that doesn't exist must raise
    (fast, before model init) instead of silently training from
    scratch; the missing CLASS-DEFAULT path stays a silent no-op."""
    from pylc_tpu.trainer import train
    cfg = tiny_cfg.replace(arch="deeplab", backbone="resnet",
                           pretrained=str(tmp_path / "nope.pth"),
                           n_epochs=1, batch_size=2)
    db_path = extracted_db[0] if isinstance(extracted_db, tuple) \
        else extracted_db
    with pytest.raises(FileNotFoundError, match="pretrained"):
        train(cfg, db_path, verbose=False)


def test_extract_without_masks(synthetic_dataset, tiny_cfg, tmp_path):
    """Mask-less extraction (inference-only DB) must survive the full
    extract -> coshuffle -> profile -> save chain (the CLI path)."""
    from pylc_tpu.extract import Extractor
    img_dir = synthetic_dataset[0]
    ex = Extractor(tiny_cfg).load(img_dir, None)
    ex.extract().coshuffle().profile()
    path = ex.save(str(tmp_path))
    assert os.path.exists(path)
