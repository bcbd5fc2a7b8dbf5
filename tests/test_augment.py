import numpy as np

from pylc_tpu.config import Config
from pylc_tpu.db.database import TileDB
from pylc_tpu.augment import Augmentor, merge_dbs, grayscale_db
from pylc_tpu.ops.augment_ops import (
    augment_batch, random_homographies, solve_homography,
)
from pylc_tpu.ops.profile import profile_tiles


def test_solve_homography_matches_cv2(rng):
    import cv2
    pts1 = np.float32([[5, 6], [40, 4], [3, 45], [44, 43]])
    pts2 = pts1 + rng.uniform(-3, 3, pts1.shape).astype(np.float32)
    got = solve_homography(pts1, pts2)
    want = cv2.getPerspectiveTransform(pts1, pts2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_augment_batch_shapes_and_validity(rng):
    n, size = 6, 64
    imgs = rng.integers(0, 256, (n, size, size, 3)).astype(np.uint8)
    masks = rng.integers(0, 9, (n, size, size)).astype(np.uint8)
    aug_i, aug_m = augment_batch(imgs, masks, rng)
    assert aug_i.shape == imgs.shape and aug_i.dtype == np.uint8
    assert aug_m.shape == masks.shape
    assert aug_m.max() < 9  # nearest-sampled mask keeps valid class ids
    assert not np.array_equal(aug_i, imgs)  # actually distorted


def _unbalanced_db(tmp_path, n=40, tile=32, n_classes=9):
    """DB where class 0 dominates so the optimizer has something to fix."""
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (n, 3, tile, tile)).astype(np.uint8)
    masks = np.zeros((n, tile, tile), np.uint8)
    # a minority of tiles carry rare classes
    for i in range(0, n, 5):
        masks[i, :, : tile // 2] = (i // 5) % (n_classes - 1) + 1
    cfg = Config().replace(tile_size=tile, ch=3, id="_db_unbal")
    prof = profile_tiles([(imgs, masks)], n_classes, tile)
    cfg = cfg.replace(**prof)
    path = str(tmp_path / "unbal.h5")
    TileDB.save(path, imgs, masks, cfg)
    return path


def test_optimize_reduces_jsd(tmp_path):
    path = _unbalanced_db(tmp_path)
    aug = Augmentor().load(path).optimize()
    assert aug.optim_meta["jsd"] < aug.meta.jsd  # more balanced than input
    rates = aug.rates
    assert rates.min() >= 0 and rates.max() <= 4  # clip range (config)
    budget = int(aug.meta.aug_n_samples_ratio * len(rates))
    assert rates.sum() < budget


def test_oversample_grows_dataset_and_profiles(tmp_path):
    path = _unbalanced_db(tmp_path)
    aug = Augmentor().load(path).optimize().oversample(device_batch=16)
    n_in = TileDB(path).size
    assert len(aug.out_imgs) == n_in + aug.rates.sum()
    assert aug.meta.id.startswith("_aug")
    assert aug.meta.n_samples == len(aug.out_imgs)
    # oversampling moved the distribution toward balance
    assert aug.meta.jsd <= TileDB(path).get_meta().jsd + 1e-6


def test_merge_and_grayscale(tmp_path):
    p1 = _unbalanced_db(tmp_path)
    out = str(tmp_path / "merged.h5")
    merge_dbs([p1, p1], out)
    db = TileDB(out)
    assert db.size == 2 * TileDB(p1).size

    gs = grayscale_db(p1, str(tmp_path / "gs.h5"))
    gdb = TileDB(gs)
    assert gdb.img_shape[1] == 1
    assert gdb.get_meta().ch == 1


def test_merge_rejects_incompatible_dbs(tmp_path):
    """Merging DBs with different ch/tile_size must fail loudly instead
    of stamping a corrupt DB with the first DB's meta."""
    import pytest
    p1 = _unbalanced_db(tmp_path)
    # grayscale copy: same schema, ch=1 -> incompatible
    gs = grayscale_db(p1, str(tmp_path / "gs2.h5"))
    with pytest.raises(ValueError, match="ch"):
        merge_dbs([p1, gs], str(tmp_path / "bad.h5"))
