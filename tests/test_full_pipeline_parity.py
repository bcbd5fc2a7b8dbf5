"""END-TO-END accuracy parity against the EXECUTED reference.

The north star (BASELINE.json) demands mIoU parity and matching
colour-mapped masks for a *trained* reference-format checkpoint — not
proxies.  This test drives the full differential experiment:

  1. scripts/ref_pipeline.py copies /root/reference to a scratch dir,
     synthesizes a deterministic learnable dataset, and runs the
     REFERENCE CLI end-to-end on CPU torch: extract -> train (DeepLab/
     ResNet101, 2 epochs) -> test, producing a trained `.pth` and the
     reference's colour-mask PNGs + `_eval.json` metrics
     (reference test.py:23-115).  Results are cached in
     /tmp/pylc_ref_run across test runs.
  2. The SAME trained checkpoint + photos go through `pylc.py test`
     (our pipeline: convert.py .pth import, tile/infer/stitch,
     evaluator).
  3. Masks are diffed pixel-for-pixel and the eval metrics compared.

Three experiments (VERDICT r3 item 1 extended coverage):

  ch3   colour, 1024x1024 (identity tile fit) — the original run.
  ch1   GRAYSCALE — exercises the reference's scalar-mean /255
        normalization (models/model.py:416-433) and the 1->3 channel
        stack for deeplab (models/model.py:310-311) end-to-end; 5 of
        the 9 published reference models are grayscale.
  fit   colour 1600x1200 photos where adjust_to_tile RESAMPLES
        (1600x1200 -> 1536x1024, reference utils/tools.py:189-193)
        and the final mask is nearest-resized back up
        (utils/tools.py:315-317) — the non-identity geometry path.

Divergence sources bounded here: bf16-free f32 inference, identical
fit/tile geometry, stitch argmax parity outside double-softmax corner
zones (docs/DEVIATIONS.md D1) — so agreement is required to be
near-total, and metric deltas tiny.
"""

import json
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF),
                       reason="reference tree not available"),
]

# thresholds: measured agreement is >=99.9% of pixels with metric deltas
# <1e-3 (see docs/PARITY.md for the recorded numbers); the thresholds
# leave margin for torch-version nondeterminism in the retrained
# checkpoint while still failing on any systematic divergence.
PIXEL_MATCH_MIN = 0.995
METRIC_ATOL = 0.01

EXPERIMENTS = ("ch3", "ch1", "fit")


def _ref_pipeline():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import ref_pipeline
    return ref_pipeline


@pytest.fixture(scope="module", params=EXPERIMENTS)
def experiment(request, tmp_path_factory):
    """(name, ref_artifacts, our_outputs) for one parity experiment."""
    rp = _ref_pipeline()
    name = request.param
    ref = {"ch3": rp.run, "ch1": rp.run_ch1, "fit": rp.run_fit}[name]()

    from pylc_tpu.config import Config
    from pylc_tpu.tester import test

    model_id = ("pylc_deeplab_ch1_schema_a" if name == "ch1"
                else "pylc_deeplab_ch3_schema_a")
    out_root = tmp_path_factory.mktemp(f"ours_{name}")
    cwd = os.getcwd()
    os.chdir(out_root)
    try:
        ours = {}
        cfg = Config().replace(compute_dtype="float32")
        for img in ref["outputs"]:
            res = test(
                cfg, ref["model_pth"],
                os.path.join(ref["raw_images"], f"{img}.jpg"),
                mask_path=os.path.join(ref["raw_masks"], f"{img}.png"),
                verbose=False)
            mask = os.path.join(
                out_root, "data", "outputs", model_id,
                "masks", f"{img}_jpg_scale_1.0.png")
            ours[img] = {"mask": mask, "metrics": res[0]["metrics"]}
        return name, ref, ours
    finally:
        os.chdir(cwd)


def test_trained_checkpoint_mask_parity(experiment):
    """Colour masks from the same trained checkpoint must agree
    pixel-for-pixel (up to argmax ties at stitch corner zones, D1)."""
    import cv2

    name, ref_arts, ours = experiment
    for img, ref_out in ref_arts["outputs"].items():
        ref_mask = cv2.imread(ref_out["mask"])
        our_mask = cv2.imread(ours[img]["mask"])
        assert ref_mask is not None and our_mask is not None
        assert ref_mask.shape == our_mask.shape, (
            name, img, ref_mask.shape, our_mask.shape)
        same = (ref_mask == our_mask).all(axis=-1)
        frac = float(same.mean())
        assert frac >= PIXEL_MATCH_MIN, (
            f"{name}/{img}: only {frac * 100:.3f}% of mask pixels agree "
            f"with the reference ({int((~same).sum())} differ)")


def test_trained_checkpoint_metric_parity(experiment):
    """Weighted F1 / IoU / MCC computed by each pipeline's evaluator on
    its own mask must agree (mIoU-parity evidence)."""
    name, ref_arts, ours = experiment
    for img, ref_out in ref_arts["outputs"].items():
        if not ref_out["eval"]:
            continue
        ref_eval = json.load(open(ref_out["eval"]))
        got = ours[img]["metrics"]
        for key in ("f1", "iou", "mcc"):
            assert abs(float(got[key]) - float(ref_eval[key])) < \
                METRIC_ATOL, (name, img, key, got[key], ref_eval[key])


def test_mask_colors_are_schema_palette(experiment):
    """Every pixel of our mask must be an exact schema RGB colour."""
    import cv2
    name, _, ours = experiment
    pal = np.array(
        [c["colour"]["rgb"] for c in json.load(
            open(os.path.join(os.path.dirname(__file__), "..", "pylc_tpu",
                              "schemas", "schema_a.json")))["classes"]],
        np.uint8)
    pal_bgr = {tuple(int(v) for v in p[::-1]) for p in pal}
    for img, out in ours.items():
        mask = cv2.imread(out["mask"])
        uniq = np.unique(mask.reshape(-1, 3), axis=0)
        for u in uniq:
            assert tuple(int(v) for v in u) in pal_bgr, (name, img, u)
