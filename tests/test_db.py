import json
import os

import h5py
import numpy as np

from pylc_tpu.config import Config
from pylc_tpu.db.database import TileDB
from pylc_tpu.db.dataset import TileDataset


def _make_db(tmp_path, n=20, tile=32, ch=3):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (n, ch, tile, tile)).astype(np.uint8)
    masks = rng.integers(0, 9, (n, tile, tile)).astype(np.uint8)
    cfg = Config().replace(tile_size=tile, ch=ch, id="_db_test")
    path = str(tmp_path / "test.h5")
    TileDB.save(path, imgs, masks, cfg)
    return path, imgs, masks, cfg


def test_h5_layout_matches_reference_format(tmp_path):
    """The .h5 must have gzip img/mask datasets + a JSON meta attribute
    (reference db/database.py:216-235)."""
    path, imgs, masks, cfg = _make_db(tmp_path)
    with h5py.File(path, "r") as f:
        assert f["img"].compression == "gzip"
        assert f["mask"].compression == "gzip"
        assert f["img"].shape == imgs.shape
        meta = json.loads(f.attrs["meta"])
        assert meta["id"] == "_db_test"
        assert meta["tile_size"] == 32
        assert meta["n_classes"] == 9
        np.testing.assert_array_equal(f["img"][()], imgs)


def test_partition_index_math(tmp_path):
    """ceil-index partition semantics (reference db/database.py:89-91)."""
    path, *_ = _make_db(tmp_path, n=20)
    tr = TileDB(path, partition=(0.0, 0.8))
    va = TileDB(path, partition=(0.8, 1.0))
    assert (tr.start, tr.end) == (0, 16)
    assert (va.start, va.end) == (16, 20)
    assert tr.partition_size + va.partition_size == 20


def test_meta_roundtrip_reference_compatible(tmp_path):
    """A reference-style meta JSON (flat Parameters vars) rehydrates."""
    path, _, _, cfg = _make_db(tmp_path)
    db = TileDB(path)
    meta = db.get_meta()
    assert meta.tile_size == 32
    # write a reference-shaped meta blob and reload
    ref_meta = {"id": "ref_db", "ch": 1, "tile_size": 16, "stride": 8,
                "px_mean": [1.0], "px_std": [2.0], "weights": [1] * 9,
                "tile_px_count": 256, "unknown_future_field": 42}
    cfg2 = Config.from_meta(ref_meta)
    assert cfg2.id == "ref_db"
    assert cfg2.ch == 1
    assert cfg2.tile_px_count == 256  # derived from tile_size=16


def test_dataset_batching_and_shuffle(tmp_path):
    path, imgs, masks, _ = _make_db(tmp_path, n=20)
    ds = TileDataset(TileDB(path), batch_size=4, shuffle=False,
                     drop_last=True, chunk_size=7)
    batches = list(ds)
    assert len(batches) == 5
    got = np.concatenate([b[0] for b in batches])
    np.testing.assert_array_equal(got, imgs)  # order preserved across chunks

    ds2 = TileDataset(TileDB(path), batch_size=4, shuffle=True, seed=1,
                      chunk_size=20)
    got2 = np.concatenate([b[0] for b in ds2])
    assert not np.array_equal(got2, imgs)
    # same content as a set
    assert sorted(got2.sum(axis=(1, 2, 3)).tolist()) == \
        sorted(imgs.sum(axis=(1, 2, 3)).tolist())


def test_dataset_global_epoch_shuffle(tmp_path):
    """Shuffle must permute the CHUNK ORDER per epoch, not just within
    chunks (VERDICT r2 weak #6: a fixed front-to-back chunk walk keeps
    the epoch sampling chunk-local) — different order across epochs with
    one seed, same sample multiset, and chunks actually interleave."""
    n, chunk = 24, 6  # 4 chunks
    rng = np.random.default_rng(3)
    imgs = np.arange(n, dtype=np.uint8)[:, None, None, None] * \
        np.ones((n, 3, 8, 8), np.uint8)  # sample value == index
    masks = rng.integers(0, 9, (n, 8, 8)).astype(np.uint8)
    path = str(tmp_path / "shuf.h5")
    TileDB.save(path, imgs, masks, Config().replace(tile_size=8, id="s"))

    def epoch_order(ds):
        return [int(b[0][i, 0, 0, 0]) for b in ds for i in range(len(b[0]))]

    ds = TileDataset(TileDB(path), batch_size=4, shuffle=True, seed=7,
                     chunk_size=chunk)
    e1, e2 = epoch_order(ds), epoch_order(ds)
    assert sorted(e1) == sorted(e2) == list(range(n))  # same multiset
    assert e1 != e2                                    # reshuffled per epoch

    # chunk order is permuted: across a few epochs the first sample out
    # must not always come from chunk 0
    first_chunks = {e1[0] // chunk, e2[0] // chunk}
    for _ in range(6):
        first_chunks.add(epoch_order(ds)[0] // chunk)
    assert len(first_chunks) > 1, "chunk order never permuted"

    # determinism: a fresh dataset with the same seed replays epoch 1
    ds_b = TileDataset(TileDB(path), batch_size=4, shuffle=True, seed=7,
                       chunk_size=chunk)
    assert epoch_order(ds_b) == e1


def test_dataset_shard_split(tmp_path):
    """Per-host shard ranges: BALANCED disjoint slices (each host gets
    exactly size//n rows; the remainder is dropped so every host runs
    the same number of SPMD steps — an uneven ceil split would deadlock
    a collective mid-epoch)."""
    path, imgs, _, _ = _make_db(tmp_path, n=20)
    db = TileDB(path)
    shards = []
    for k in range(3):
        rows = [im for im, _ in db.iter_chunks(chunk_size=100,
                                               shard=(k, 3))]
        shards.append(np.concatenate(rows))
    sizes = [len(s) for s in shards]
    assert sizes == [6, 6, 6]  # equal on every host
    got = np.concatenate(shards)
    all_sums = set(imgs.sum(axis=(1, 2, 3)).tolist())
    got_sums = got.sum(axis=(1, 2, 3)).tolist()
    assert len(set(got_sums)) == len(got_sums)  # disjoint
    assert set(got_sums) <= all_sums            # subset of the data
    # the unsharded view still covers everything
    full = np.concatenate([im for im, _ in db.iter_chunks(100)])
    assert len(full) == 20
