"""HDF5 DB artifact interchange with the reference — BOTH directions.

db/database.py claims "DBs written by either implementation open in the
other" (layout parity with reference db/database.py:196-239, meta
rehydration :164).  VERDICT r3 item 2: prove it by execution, not by
inspection.

Forward:  the .h5 the REFERENCE wrote during scripts/ref_pipeline.py's
          extract step is opened with our TileDB — meta round-trips
          into a Config, every sample matches a raw h5py read, and a
          full (tiny) training run consumes it.
Reverse:  OUR Extractor writes a .h5 from the same raw photos and the
          REFERENCE's `pylc.py train` runs a full epoch from it (in a
          separate scratch copy so the cached parity checkpoint is not
          clobbered).
"""

import json
import os
import shutil
import subprocess
import sys

import h5py
import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF),
                       reason="reference tree not available"),
]


@pytest.fixture(scope="module")
def ref_artifacts():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import ref_pipeline
    return ref_pipeline.run()


def _ref_db_path(ref_artifacts):
    if "db" in ref_artifacts:
        return ref_artifacts["db"]
    # round-3 cached DONE.json predates the "db" key
    db_dir = os.path.join(ref_artifacts["scratch"], "ref", "data", "db")
    dbs = [f for f in os.listdir(db_dir)
           if f.startswith("_db_pylc_colour") and f.endswith(".h5")]
    assert dbs, db_dir
    return os.path.join(db_dir, dbs[0])


# --------------------------------------------------------------------- #
# forward: reference-written .h5 -> our stack
# --------------------------------------------------------------------- #

def test_reference_db_meta_roundtrip(ref_artifacts):
    """The reference's JSON meta attr rehydrates into our Config with
    the data facts intact (reference db/database.py:164,235)."""
    from pylc_tpu.db.database import TileDB

    db = TileDB(_ref_db_path(ref_artifacts))
    cfg = db.get_meta()
    assert cfg.ch == 3
    assert cfg.tile_size == 512
    assert cfg.n_classes == 9
    assert len(cfg.px_mean) == 3 and len(cfg.px_std) == 3
    # profile stats must be present — they drive loss weighting
    # (reference utils/profile.py:129-130 -> models/model.py:199)
    assert cfg.weights is not None and len(cfg.weights) == 9
    assert db.size == db.img_shape[0] > 0


def test_reference_db_sample_for_sample(ref_artifacts):
    """TileDB.read_chunk returns byte-identical tiles to a raw h5py
    read of the reference-written datasets."""
    from pylc_tpu.db.database import TileDB

    path = _ref_db_path(ref_artifacts)
    db = TileDB(path)
    imgs, masks = db.read_chunk(0, db.size)
    with h5py.File(path, "r") as f:
        raw_img = f["img"][:]
        raw_mask = f["mask"][:]
    assert imgs.shape == raw_img.shape == (db.size, 3, 512, 512)
    assert masks.shape == raw_mask.shape == (db.size, 512, 512)
    np.testing.assert_array_equal(imgs, raw_img)
    np.testing.assert_array_equal(masks, raw_mask)
    # masks are class indices in range
    assert masks.max() < 9


def test_reference_db_trains_in_our_stack(ref_artifacts, tmp_path):
    """Full trainer run (1 epoch, tiny U-Net) fed straight from the
    reference-written .h5."""
    from pylc_tpu.config import Config
    from pylc_tpu.trainer import train

    cfg = Config().replace(
        arch="unet", unet_wf=2, n_epochs=1, batch_size=2, clip=0.5,
        compute_dtype="float32", save_dir=str(tmp_path / "save"),
        n_workers=0, report=1)
    summary = train(cfg, _ref_db_path(ref_artifacts), n_devices=1,
                    verbose=False)
    losses = os.path.join(tmp_path, "save", summary["model_id"],
                          "losses.json")
    rec = json.load(open(losses))
    assert rec["valid"], "validation never ran from the reference DB"
    assert np.isfinite([v[0] for v in rec["train"]]).all()


# --------------------------------------------------------------------- #
# reverse: our .h5 -> reference train.py
# --------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def our_db_from_ref_raw(ref_artifacts, tmp_path_factory):
    """Extract OUR .h5 from the same raw photos the reference used."""
    from pylc_tpu.config import Config
    from pylc_tpu.extract import Extractor

    out = tmp_path_factory.mktemp("ourdb")
    cfg = Config().replace(ch=3, n_workers=0)
    ex = Extractor(cfg).load(
        ref_artifacts["raw_images"], ref_artifacts["raw_masks"]
    ).extract(verbose=False)
    ex.coshuffle()
    ex.profile()
    return ex.save(str(out))


def test_our_db_opens_in_reference(our_db_from_ref_raw):
    """The reference's DB wrapper + Buffer read our .h5: layout, dtype,
    and meta JSON all parse (reference db/database.py:23-117)."""
    path = our_db_from_ref_raw
    with h5py.File(path, "r") as f:
        assert f["img"].dtype == np.uint8
        assert f["mask"].dtype == np.uint8
        assert f["img"].shape[1:] == (3, 512, 512)
        assert f["mask"].shape[1:] == (512, 512)
        meta = json.loads(f.attrs["meta"])
    # the fields the reference's train path actually consumes
    # (model.py:199 weights; model.py:416-445 px stats; database.py:164)
    for key in ("ch", "n_classes", "px_mean", "px_std", "weights",
                "tile_size", "palette_rgb"):
        assert key in meta, f"meta missing {key!r} for reference train"


def test_our_db_trains_in_reference(our_db_from_ref_raw, ref_artifacts):
    """The REFERENCE's `pylc.py train` runs a full epoch from our .h5
    (fresh scratch copy; deeplab/resnet, the reference flagship)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import ref_pipeline

    ref_copy = ref_pipeline.ensure_ref_copy()
    ref2 = os.path.join(ref_artifacts["scratch"], "ref_interchange")
    if os.path.exists(ref2):
        shutil.rmtree(ref2)

    def _ignore_data_artifacts(dirpath, names):
        # Skip only the ARTIFACT dirs (data/db, data/save, data/outputs)
        # from the donor copy — a bare ignore_patterns("db", ...) would
        # also drop the reference's db/ SOURCE package and break
        # `from db.dataset import MLPDataset` in the subprocess.
        if os.path.basename(dirpath) == "data":
            return {n for n in names if n in ("db", "save", "outputs")}
        return set()

    shutil.copytree(ref_copy, ref2, ignore=_ignore_data_artifacts)
    os.makedirs(os.path.join(ref2, "data", "models"), exist_ok=True)

    log = os.path.join(ref_artifacts["scratch"], "interchange_train.log")
    with open(log, "w") as f:
        subprocess.run(
            [sys.executable, "pylc.py", "train",
             "--db", our_db_from_ref_raw, "--arch", "deeplab",
             "--backbone", "resnet", "--batch_size", "2",
             "--n_epochs", "1", "--n_workers", "0", "--clip", "0.5"],
            cwd=ref2, stdout=f, stderr=subprocess.STDOUT, check=True,
            timeout=3600)

    save_dir = os.path.join(ref2, "data", "save",
                            "pylc_deeplab_ch3_schema_a")
    assert os.path.exists(os.path.join(save_dir, "checkpoint.pth")), \
        open(log).read()[-2000:]
