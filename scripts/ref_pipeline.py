#!/usr/bin/env python3
"""Run the REFERENCE pipeline end-to-end to produce parity artifacts.

Copies /root/reference to a scratch dir (the reference tree is
read-only and writes its artifacts relative to cwd), generates a
deterministic synthetic raw dataset, then drives the reference CLI
(`pylc.py extract` / `train` / `test`, reference test.py:23-115) with
torch on CPU to produce:

  - a TRAINED reference-format DeepLab checkpoint (`<model_id>.pth`)
  - the reference's colour-mask PNG + `_eval.json` for held-out photos

Three experiments (each cached under SCRATCH via its own DONE file):

  run()      ch=3 colour, 1024x1024 photos (identity tile fit) — train
             + test.  The round-2/3 experiment.
  run_ch1()  ch=1 GRAYSCALE, 1024x1024 — train + test.  5 of the 9
             published reference models are grayscale and the ch=1
             path carries the riskiest normalization quirks
             (reference models/model.py:416-445 scalar-mean /255
             normalize; :310-311 1->3 channel stacking), so parity
             must be proven end-to-end, not just unit-tested.
  run_fit()  ch=3, 1600x1200 photos where adjust_to_tile is NOT the
             identity (reference utils/tools.py:151-206: 1600x1200 ->
             resize to 1536x1024, a real non-uniform resample) — test
             only, reusing run()'s trained checkpoint.

tests/test_full_pipeline_parity.py feeds the same checkpoints + photos
through `pylc.py test` (our pipeline) and diffs the masks/metrics —
the end-to-end accuracy-parity evidence demanded by the north star
(BASELINE.json: mIoU parity, byte-identical colour-mapped masks).

Everything is cached under SCRATCH; delete it to regenerate.

Usage: python scripts/ref_pipeline.py [--force] [--exp ch3|ch1|fit|all]
"""

import json
import os
import shutil
import subprocess
import sys

import numpy as np

REF = "/root/reference"
SCRATCH = os.environ.get("PYLC_REF_SCRATCH", "/tmp/pylc_ref_run")
DONE = os.path.join(SCRATCH, "DONE.json")          # ch3 (legacy name)
DONE_CH1 = os.path.join(SCRATCH, "DONE_ch1.json")
DONE_FIT = os.path.join(SCRATCH, "DONE_fit.json")

N_IMAGES = 4          # 4 extract tiles each at stride 512
# The FITTED height must give >=2 tile rows at test stride 256: with a
# single row the reference's reconstruct crops the bottom overlap "to
# be averaged" with a next row that never comes and leaves the bottom
# 256 px of its np.empty canvas UNINITIALIZED (utils/tools.py:295-300
# with n_strides_in_col == 1) — docs/DEVIATIONS.md F14.  adjust_to_tile
# floors the height to a TILE multiple (1024x768 -> 1024x512, single
# row!), so use square 1024x1024 photos: fit is the identity and the
# test grid is 3 rows x 3 cols.
H, W = 1024, 1024
# Fitted-geometry experiment: 1600x1200 -> w_scaled = (1600//512)*512 =
# 1536, h_scaled = (ceil(1536/(1600/1200)) // 512)*512 = 1024 — a real
# resize (0.96x horizontal, 0.853x vertical) with 2 tile rows (no F14).
H_FIT, W_FIT = 1200, 1600
N_EPOCHS = 2
BATCH = 2
SEED = 7
TEST_IMAGES = ["p0", "p3"]   # p3's tiles fall in the valid partition tail


def make_raw_data(root: str, schema_path: str, h: int = H, w: int = W,
                  ch: int = 3, seed: int = SEED, n_images: int = N_IMAGES,
                  prefix: str = "p"):
    """Deterministic, *learnable* synthetic raw data: masks are vertical
    class bands; image intensity is correlated with the class so a few
    training steps produce a non-degenerate model.  ch=1 writes
    single-channel grayscale JPEGs (the reference reads them with
    IMREAD_GRAYSCALE when --ch 1, utils/tools.py:77-148)."""
    import cv2

    rng = np.random.default_rng(seed)
    classes = json.load(open(schema_path))["classes"]
    pal = np.array([c["colour"]["rgb"] for c in classes], np.uint8)
    n = len(pal)
    img_dir = os.path.join(root, "images")
    mask_dir = os.path.join(root, "masks")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    for i in range(n_images):
        # vertical bands, rotated per image so every class appears
        cmap = ((np.arange(w) * n // w) + i) % n
        cmap = np.broadcast_to(cmap.astype(np.uint8), (h, w))
        base = (cmap.astype(np.float32) * (220.0 / n)) + 20.0
        if ch == 1:
            img = base + rng.normal(0, 12, (h, w))
            img = np.clip(img, 0, 255).astype(np.uint8)
            cv2.imwrite(os.path.join(img_dir, f"{prefix}{i}.jpg"), img)
        else:
            img = np.stack([base + rng.normal(0, 12, (h, w)) + 8.0 * c
                            for c in range(3)], axis=-1)
            img = np.clip(img, 0, 255).astype(np.uint8)
            cv2.imwrite(os.path.join(img_dir, f"{prefix}{i}.jpg"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(mask_dir, f"{prefix}{i}.png"),
                    cv2.cvtColor(pal[cmap], cv2.COLOR_RGB2BGR))
    return img_dir, mask_dir


def sh(args, cwd, log):
    print("+", " ".join(args), flush=True)
    with open(log, "a") as f:
        f.write("\n+ " + " ".join(args) + "\n")
        f.flush()
        subprocess.run(args, cwd=cwd, stdout=f, stderr=subprocess.STDOUT,
                       check=True)


def ensure_ref_copy() -> str:
    """Copy /root/reference into SCRATCH and apply environment
    compatibility patches to the COPY only (idempotent; patches are
    re-applied to an existing copy so cache upgrades pick them up):

    1. torch>=2.6 weights_only: the reference predates the
       weights_only=True default and its checkpoints pickle a
       config.Parameters instance, so its own torch.load calls fail on
       the modern torch in this image.
    2. numpy>=2.0 NEP-50 scalar promotion: the grayscale normalize
       (reference models/model.py:433) computes
       ``(float32_array - np.float64_scalar) / np.float64_scalar``,
       which NEP 50 promotes to float64 — torch then feeds a Double
       tensor into Float conv weights and crashes.  On the reference's
       own numpy<2 the expression stayed float32; ``.float()`` restores
       that dtype (values differ only in the low mantissa bits of the
       float64->float32 round)."""
    ref_copy = os.path.join(SCRATCH, "ref")
    if not os.path.exists(os.path.join(ref_copy, "pylc.py")):
        os.makedirs(SCRATCH, exist_ok=True)
        shutil.copytree(REF, ref_copy)

    for rel in ("models/model.py", "models/modules/checkpoint.py",
                "models/backbone/resnet.py"):
        fp = os.path.join(ref_copy, rel)
        src = open(fp).read()
        patched = src
        for call in ("torch.load(self.model_path, map_location=self.device",
                     "torch.load(self.checkpoint_file",
                     "torch.load(resnet_path"):
            if call in patched and call + ", weights_only=False" \
                    not in patched:
                patched = patched.replace(call,
                                          call + ", weights_only=False")
        gray = ("return torch.tensor("
                "(img.numpy().astype('float32') - mean) / std) / 255")
        gray_fixed = ("return torch.tensor("
                      "(img.numpy().astype('float32') - mean) / std)"
                      ".float() / 255")
        if gray in patched:
            patched = patched.replace(gray, gray_fixed)
        if patched != src:
            open(fp, "w").write(patched)

    # the reference's default meta.pretrained is the path
    # './data/models/resnet101-5d3b4d8f.pth' (reference config.py:188)
    # and ResNet._load_pretrained_model torch.loads it unconditionally
    # (resnet.py:149-158); an empty state_dict satisfies the load
    # without changing the random init.
    os.makedirs(os.path.join(ref_copy, "data", "models"), exist_ok=True)
    import torch
    torch.save({}, os.path.join(ref_copy, "data", "models",
                                "resnet101-5d3b4d8f.pth"))
    return ref_copy


def _extract_train(ref_copy: str, img_dir: str, mask_dir: str, ch: int,
                   log: str) -> str:
    """Reference extract + train; returns the trained .pth path."""
    import torch
    torch.manual_seed(SEED)
    py = sys.executable

    db_dir = os.path.join(ref_copy, "data", "db")
    before = set(os.listdir(db_dir)) if os.path.isdir(db_dir) else set()
    sh([py, "pylc.py", "extract", "-i", img_dir, "-m", mask_dir,
        "--ch", str(ch)], ref_copy, log)
    dbs = [f for f in os.listdir(db_dir)
           if f.endswith(".h5") and f not in before]
    assert len(dbs) == 1, dbs
    db = os.path.join(db_dir, dbs[0])

    sh([py, "pylc.py", "train", "--db", db, "--arch", "deeplab",
        "--backbone", "resnet", "--batch_size", str(BATCH),
        "--n_epochs", str(N_EPOCHS), "--n_workers", "0"], ref_copy, log)

    model_id = f"pylc_deeplab_ch{ch}_schema_a"
    model_pth = os.path.join(ref_copy, "data", "save", model_id,
                             model_id + ".pth")
    if not os.path.exists(model_pth):
        # best-model gating never fired; the rolling checkpoint carries
        # the same state_dict + meta payload (reference checkpoint.py)
        model_pth = os.path.join(ref_copy, "data", "save", model_id,
                                 "checkpoint.pth")
    assert os.path.exists(model_pth), model_pth
    return db, model_pth


def _test_images(ref_copy: str, model_pth: str, img_dir: str,
                 mask_dir: str, names, model_id: str, log: str) -> dict:
    py = sys.executable
    outputs = {}
    for name in names:
        sh([py, "pylc.py", "test", "-l", model_pth,
            "-i", os.path.join(img_dir, f"{name}.jpg"),
            "-m", os.path.join(mask_dir, f"{name}.png")], ref_copy, log)
        # reference fid naming: <file>_<ext>_scale_<s> (test.py:56-59)
        fid = f"{name}_jpg_scale_1.0"
        odir = os.path.join(ref_copy, "data", "outputs", model_id)
        mask_png = os.path.join(odir, "masks", f"{fid}.png")
        eval_json = os.path.join(odir, "metrics", f"{fid}_eval.json")
        assert os.path.exists(mask_png), mask_png
        outputs[name] = {"mask": mask_png,
                         "eval": eval_json if os.path.exists(eval_json)
                         else None}
    return outputs


def run(force: bool = False) -> dict:
    """ch=3, identity-fit experiment (cached). Returns artifact paths."""
    if os.path.exists(DONE) and not force:
        return json.load(open(DONE))
    if force and os.path.exists(SCRATCH):
        shutil.rmtree(SCRATCH)

    ref_copy = ensure_ref_copy()
    log = os.path.join(SCRATCH, "ref_pipeline.log")
    raw = os.path.join(SCRATCH, "raw")
    img_dir, mask_dir = make_raw_data(
        raw, os.path.join(ref_copy, "schemas", "schema_a.json"))

    db, model_pth = _extract_train(ref_copy, img_dir, mask_dir, 3, log)
    outputs = _test_images(ref_copy, model_pth, img_dir, mask_dir,
                           TEST_IMAGES, "pylc_deeplab_ch3_schema_a", log)

    result = {
        "scratch": SCRATCH,
        "model_pth": model_pth,
        "db": db,
        "raw_images": img_dir,
        "raw_masks": mask_dir,
        "outputs": outputs,
    }
    with open(DONE, "w") as f:
        json.dump(result, f, indent=2)
    return result


def run_ch1(force: bool = False) -> dict:
    """ch=1 GRAYSCALE experiment: extract/train/test with --ch 1."""
    if os.path.exists(DONE_CH1) and not force:
        return json.load(open(DONE_CH1))

    ref_copy = ensure_ref_copy()
    log = os.path.join(SCRATCH, "ref_pipeline_ch1.log")
    raw = os.path.join(SCRATCH, "raw_ch1")
    img_dir, mask_dir = make_raw_data(
        raw, os.path.join(ref_copy, "schemas", "schema_a.json"),
        ch=1, seed=SEED + 1)

    db, model_pth = _extract_train(ref_copy, img_dir, mask_dir, 1, log)
    outputs = _test_images(ref_copy, model_pth, img_dir, mask_dir,
                           TEST_IMAGES, "pylc_deeplab_ch1_schema_a", log)

    result = {
        "scratch": SCRATCH,
        "model_pth": model_pth,
        "db": db,
        "raw_images": img_dir,
        "raw_masks": mask_dir,
        "outputs": outputs,
    }
    with open(DONE_CH1, "w") as f:
        json.dump(result, f, indent=2)
    return result


def run_fit(force: bool = False) -> dict:
    """Non-identity adjust_to_tile experiment: 1600x1200 photos through
    the ch=3 trained checkpoint (test only; fit resamples to 1536x1024,
    reference utils/tools.py:189-193)."""
    if os.path.exists(DONE_FIT) and not force:
        return json.load(open(DONE_FIT))

    base = run()  # needs the trained ch3 model
    ref_copy = ensure_ref_copy()
    log = os.path.join(SCRATCH, "ref_pipeline_fit.log")
    raw = os.path.join(SCRATCH, "raw_fit")
    img_dir, mask_dir = make_raw_data(
        raw, os.path.join(ref_copy, "schemas", "schema_a.json"),
        h=H_FIT, w=W_FIT, seed=SEED + 2, n_images=2, prefix="f")

    outputs = _test_images(ref_copy, base["model_pth"], img_dir, mask_dir,
                           ["f0", "f1"], "pylc_deeplab_ch3_schema_a", log)

    result = {
        "scratch": SCRATCH,
        "model_pth": base["model_pth"],
        "raw_images": img_dir,
        "raw_masks": mask_dir,
        "outputs": outputs,
    }
    with open(DONE_FIT, "w") as f:
        json.dump(result, f, indent=2)
    return result


if __name__ == "__main__":
    force = "--force" in sys.argv
    exp = "all"
    if "--exp" in sys.argv:
        exp = sys.argv[sys.argv.index("--exp") + 1]
    res = {}
    if exp in ("ch3", "all"):
        res["ch3"] = run(force=force)
    if exp in ("ch1", "all"):
        res["ch1"] = run_ch1(force=force)
    if exp in ("fit", "all"):
        res["fit"] = run_fit(force=force)
    print(json.dumps(res, indent=2))
