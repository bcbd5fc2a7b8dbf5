"""Published-checkpoint (.pth) interchange with the reference — the
REVERSE direction, executed (VERDICT r4 item 2 / missing #1).

Forward interchange (reference-trained .pth through our pipeline) is
proven by tests/test_full_pipeline_parity.py.  This test proves the
direction real users of the published format care about: a model
trained BY OUR STACK, exported with ``export_deeplab_pth``, is loaded
by the REFERENCE's own load path (reference models/model.py:78-121
torch.load -> meta.update -> build -> load_state_dict(strict), schema
from models/modules/checkpoint.py:53-66) and segments photos to the
same masks/metrics our pipeline produces from the native checkpoint.

Flow:
  1. OUR extractor builds a 128-px-tile DB from the same raw photos
     the cached reference experiment used (scripts/ref_pipeline.py).
  2. OUR trainer fits deeplab/resnet101 on it (tiny schedule — the
     weights just have to be ours and confidently non-degenerate; the
     synthetic bands are learnable in a handful of steps).
  3. export_deeplab_pth -> our_export.pth.
  4. REFERENCE leg: `pylc.py test -l our_export.pth` in a fresh
     scratch copy (torch CPU).
  5. OUR leg: pylc_tpu.tester.test with the native state on the same
     photo.
  6. Diff: mask pixel agreement + F1/IoU/MCC deltas.

128-px tiles keep the CPU training leg inside the test budget; every
geometry decision downstream (reference test.py:61-64 stride =
tile_size//2, Extractor(model.meta)) flows from the exported meta, so
both pipelines tile the test photo identically.
"""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF),
                       reason="reference tree not available"),
]

# same bar as tests/test_full_pipeline_parity.py (measured agreement
# >=99.9%; margin for cross-framework conv float noise at low-margin
# pixels of a briefly-trained model)
PIXEL_MATCH_MIN = 0.995
METRIC_ATOL = 0.01

TEST_IMG = "q0"


def _ref_pipeline():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import ref_pipeline
    return ref_pipeline


@pytest.fixture(scope="module")
def ref_artifacts():
    return _ref_pipeline().run()


@pytest.fixture(scope="module")
def test_photo(ref_artifacts, tmp_path_factory):
    """A dedicated 512x512 photo/mask pair: at meta tile_size=128 the
    reference tiles it 7x7 at stride 64 (~1 TFLOP of torch-CPU forward
    instead of ~5 for a 1024^2 photo), keeping the uncacheable torch
    leg inside the test budget.  512 is a tile multiple -> identity
    fit, >=2 tile rows (no reference F14 canvas bug)."""
    rp = _ref_pipeline()
    raw = str(tmp_path_factory.mktemp("pth_raw"))
    img_dir, mask_dir = rp.make_raw_data(
        raw, os.path.join(os.path.dirname(__file__), "..", "pylc_tpu",
                          "schemas", "schema_a.json"),
        h=512, w=512, seed=rp.SEED + 3, n_images=1, prefix="q")
    return img_dir, mask_dir


@pytest.fixture(scope="module")
def our_export(ref_artifacts, tmp_path_factory):
    """Train ours on our own 128-tile DB, export the reference-schema
    .pth; returns (pth_path, native_ckpt_path, train_cfg)."""
    from pylc_tpu.config import Config
    from pylc_tpu.convert import export_deeplab_pth
    from pylc_tpu.extract import Extractor
    from pylc_tpu.trainer import train

    base = tmp_path_factory.mktemp("pth_interchange")

    cfg = Config().replace(ch=3, tile_size=128, stride=128, n_workers=0)
    ex = Extractor(cfg).load(
        ref_artifacts["raw_images"], ref_artifacts["raw_masks"]
    ).extract(scale=1.0, verbose=False)
    ex.coshuffle()
    ex.profile()
    db = ex.save(str(base))

    tcfg = Config().replace(
        arch="deeplab", backbone="resnet", ch=3, tile_size=128,
        batch_size=8, n_epochs=2, grad_clip=0.25, lr=1e-3,
        compute_dtype="float32", n_workers=0, report=1,
        save_dir=str(base / "save"))
    summary = train(tcfg, db, n_devices=1, verbose=False)
    cfg_trained = summary["config"]
    ckpt = os.path.join(str(base / "save"), summary["model_id"],
                        summary["model_id"] + ".ckpt")
    assert os.path.exists(ckpt), "best-model gate never fired"

    # Export the BEST-GATED checkpoint — the same weights the native
    # leg serves — not summary["state"] (the final step's weights,
    # which on a short schedule differ by a whole optimizer step and
    # make the two legs compare different models).
    from pylc_tpu.tester import load_model
    state = load_model(ckpt, Config().replace(
        compute_dtype="float32"))[1]

    # reference gen_id() names outputs after the .pth FILE when loaded
    # by path (models/model.py:482-492 get_fname), so match the id our
    # own pipeline will use
    pth = str(base / "pylc_deeplab_ch3_schema_a.pth")
    # export from a config with a training-time dataset clip: the
    # exporter must sanitize it to 1.0 (reference bug F15 — its test
    # path would otherwise drop (1-clip) of the photo's tiles and crash
    # in reconstruct, utils/tools.py:261 via db/database.py:71)
    export_deeplab_pth(state, cfg_trained.replace(clip=0.25), pth)
    return pth, ckpt, cfg_trained


@pytest.fixture(scope="module")
def ref_leg(ref_artifacts, our_export, test_photo, tmp_path_factory):
    """Run the REFERENCE's `pylc.py test` on our exported .pth."""
    rp = _ref_pipeline()
    pth, _, _ = our_export
    ref_copy = rp.ensure_ref_copy()
    ref2 = os.path.join(ref_artifacts["scratch"], "ref_pth_interchange")
    if os.path.exists(ref2):
        shutil.rmtree(ref2)
    # exclude only the artifact tree (data/{db,save,outputs}) — NOT
    # bare "db"/"save" patterns, which would also drop the reference's
    # db/ SOURCE package and break its imports
    shutil.copytree(ref_copy, ref2,
                    ignore=shutil.ignore_patterns("data"))

    log = os.path.join(ref_artifacts["scratch"], "pth_interchange.log")
    img_dir, mask_dir = test_photo
    img = os.path.join(img_dir, f"{TEST_IMG}.jpg")
    mask = os.path.join(mask_dir, f"{TEST_IMG}.png")
    with open(log, "w") as f:
        subprocess.run(
            [sys.executable, "pylc.py", "test", "-l", pth,
             "-i", img, "-m", mask],
            cwd=ref2, stdout=f, stderr=subprocess.STDOUT, check=True,
            timeout=3600)

    fid = f"{TEST_IMG}_jpg_scale_1.0"
    odir = os.path.join(ref2, "data", "outputs",
                        "pylc_deeplab_ch3_schema_a")
    out = {"mask": os.path.join(odir, "masks", f"{fid}.png"),
           "eval": os.path.join(odir, "metrics", f"{fid}_eval.json"),
           "log": log}
    assert os.path.exists(out["mask"]), open(log).read()[-3000:]
    return out


@pytest.fixture(scope="module")
def our_leg(our_export, test_photo, tmp_path_factory):
    """Our own pipeline on the NATIVE checkpoint, same photo."""
    from pylc_tpu.config import Config
    from pylc_tpu.tester import test

    _, ckpt, _ = our_export
    img_dir, mask_dir = test_photo
    out_root = tmp_path_factory.mktemp("ours_pth")
    cwd = os.getcwd()
    os.chdir(out_root)
    try:
        res = test(
            Config().replace(compute_dtype="float32"), ckpt,
            os.path.join(img_dir, f"{TEST_IMG}.jpg"),
            mask_path=os.path.join(mask_dir, f"{TEST_IMG}.png"),
            verbose=False)
    finally:
        os.chdir(cwd)
    mask = os.path.join(
        out_root, "data", "outputs", "pylc_deeplab_ch3_schema_a",
        "masks", f"{TEST_IMG}_jpg_scale_1.0.png")
    assert os.path.exists(mask)
    return {"mask": mask, "metrics": res[0]["metrics"]}


def test_reference_loads_our_export(ref_leg):
    """The reference's strict load_state_dict + meta rebuild accepted
    our artifact (it exits non-zero / raises on any mismatch)."""
    log = open(ref_leg["log"]).read()
    assert "Loading model" in log
    assert os.path.getsize(ref_leg["mask"]) > 0


def test_reverse_mask_parity(ref_leg, our_leg):
    """Masks from our native ckpt (our pipeline) and our exported .pth
    (REFERENCE pipeline) agree pixel-for-pixel."""
    import cv2

    ref_mask = cv2.imread(ref_leg["mask"])
    our_mask = cv2.imread(our_leg["mask"])
    assert ref_mask is not None and our_mask is not None
    assert ref_mask.shape == our_mask.shape
    same = (ref_mask == our_mask).all(axis=-1)
    frac = float(same.mean())
    assert frac >= PIXEL_MATCH_MIN, (
        f"only {frac * 100:.3f}% of mask pixels agree "
        f"({int((~same).sum())} differ)")


def test_reverse_metric_parity(ref_leg, our_leg):
    """The reference's evaluator on its mask vs ours on ours."""
    if not os.path.exists(ref_leg["eval"]):
        pytest.skip("reference produced no eval json")
    ref_eval = json.load(open(ref_leg["eval"]))
    got = our_leg["metrics"]
    for key in ("f1", "iou", "mcc"):
        assert abs(float(got[key]) - float(ref_eval[key])) < METRIC_ATOL, \
            (key, got[key], ref_eval[key])
