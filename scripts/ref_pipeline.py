#!/usr/bin/env python3
"""Run the REFERENCE pipeline end-to-end to produce parity artifacts.

Copies /root/reference to a scratch dir (the reference tree is
read-only and writes its artifacts relative to cwd), generates a
deterministic synthetic raw dataset, then drives the reference CLI
(`pylc.py extract` / `train` / `test`, reference test.py:23-115) with
torch on CPU to produce:

  - a TRAINED reference-format DeepLab checkpoint (`<model_id>.pth`)
  - the reference's colour-mask PNG + `_eval.json` for held-out photos

tests/test_full_pipeline_parity.py feeds the same checkpoint + photos
through `pylc.py test` (our pipeline) and diffs the masks/metrics —
the end-to-end accuracy-parity evidence demanded by the north star
(BASELINE.json: mIoU parity, byte-identical colour-mapped masks).

Everything is cached under SCRATCH; delete it to regenerate.

Usage: python scripts/ref_pipeline.py [--force]
"""

import json
import os
import shutil
import subprocess
import sys

import numpy as np

REF = "/root/reference"
SCRATCH = os.environ.get("PYLC_REF_SCRATCH", "/tmp/pylc_ref_run")
DONE = os.path.join(SCRATCH, "DONE.json")

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
N_EPOCHS = 2
BATCH = 2
SEED = 7
TEST_IMAGES = ["p0", "p3"]   # p3's tiles fall in the valid partition tail


def make_raw_data(root: str, schema_path: str):
    """Deterministic, *learnable* synthetic raw data: masks are vertical
    class bands; image intensity is correlated with the class so a few
    training steps produce a non-degenerate model."""
    import cv2

    rng = np.random.default_rng(SEED)
    classes = json.load(open(schema_path))["classes"]
    pal = np.array([c["colour"]["rgb"] for c in classes], np.uint8)
    n = len(pal)
    img_dir = os.path.join(root, "images")
    mask_dir = os.path.join(root, "masks")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    for i in range(N_IMAGES):
        # vertical bands, rotated per image so every class appears
        cmap = ((np.arange(W) * n // W) + i) % n
        cmap = np.broadcast_to(cmap.astype(np.uint8), (H, W))
        base = (cmap.astype(np.float32) * (220.0 / n)) + 20.0
        img = np.stack([base + rng.normal(0, 12, (H, W)) + 8.0 * c
                        for c in range(3)], axis=-1)
        img = np.clip(img, 0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(img_dir, f"p{i}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(mask_dir, f"p{i}.png"),
                    cv2.cvtColor(pal[cmap], cv2.COLOR_RGB2BGR))
    return img_dir, mask_dir


def sh(args, cwd, log):
    print("+", " ".join(args), flush=True)
    with open(log, "a") as f:
        f.write("\n+ " + " ".join(args) + "\n")
        f.flush()
        subprocess.run(args, cwd=cwd, stdout=f, stderr=subprocess.STDOUT,
                       check=True)


def run(force: bool = False) -> dict:
    """Run (or reuse) the reference pipeline. Returns artifact paths."""
    if os.path.exists(DONE) and not force:
        return json.load(open(DONE))

    if os.path.exists(SCRATCH):
        shutil.rmtree(SCRATCH)
    ref_copy = os.path.join(SCRATCH, "ref")
    shutil.copytree(REF, ref_copy)
    log = os.path.join(SCRATCH, "ref_pipeline.log")

    # torch>=2.6 compatibility for the scratch COPY only: the reference
    # predates the weights_only=True default and its checkpoints pickle
    # a config.Parameters instance, so its own torch.load calls fail on
    # the modern torch in this image.
    for rel in ("models/model.py", "models/modules/checkpoint.py",
                "models/backbone/resnet.py"):
        fp = os.path.join(ref_copy, rel)
        src = open(fp).read()
        patched = src
        for call in ("torch.load(self.model_path, map_location=self.device",
                     "torch.load(self.checkpoint_file",
                     "torch.load(resnet_path"):
            patched = patched.replace(
                call, call + ", weights_only=False")
        if patched != src:
            open(fp, "w").write(patched)

    raw = os.path.join(SCRATCH, "raw")
    img_dir, mask_dir = make_raw_data(
        raw, os.path.join(ref_copy, "schemas", "schema_a.json"))

    # the reference's default meta.pretrained is the path
    # './data/models/resnet101-5d3b4d8f.pth' (reference config.py:188)
    # and ResNet._load_pretrained_model torch.loads it unconditionally
    # (resnet.py:149-158); an empty state_dict satisfies the load
    # without changing the random init.
    os.makedirs(os.path.join(ref_copy, "data", "models"), exist_ok=True)
    import torch
    torch.manual_seed(SEED)
    torch.save({}, os.path.join(ref_copy, "data", "models",
                                "resnet101-5d3b4d8f.pth"))

    py = sys.executable
    sh([py, "pylc.py", "extract", "-i", img_dir, "-m", mask_dir,
        "--ch", "3"], ref_copy, log)
    dbs = [f for f in os.listdir(os.path.join(ref_copy, "data", "db"))
           if f.endswith(".h5")]
    assert len(dbs) == 1, dbs
    db = os.path.join(ref_copy, "data", "db", dbs[0])

    sh([py, "pylc.py", "train", "--db", db, "--arch", "deeplab",
        "--backbone", "resnet", "--batch_size", str(BATCH),
        "--n_epochs", str(N_EPOCHS), "--n_workers", "0"], ref_copy, log)

    model_id = "pylc_deeplab_ch3_schema_a"
    model_pth = os.path.join(ref_copy, "data", "save", model_id,
                             model_id + ".pth")
    if not os.path.exists(model_pth):
        # best-model gating never fired; the rolling checkpoint carries
        # the same state_dict + meta payload (reference checkpoint.py)
        model_pth = os.path.join(ref_copy, "data", "save", model_id,
                                 "checkpoint.pth")
    assert os.path.exists(model_pth), model_pth

    outputs = {}
    for name in TEST_IMAGES:
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

    result = {
        "scratch": SCRATCH,
        "model_pth": model_pth,
        "raw_images": img_dir,
        "raw_masks": mask_dir,
        "outputs": outputs,
    }
    with open(DONE, "w") as f:
        json.dump(result, f, indent=2)
    return result


if __name__ == "__main__":
    res = run(force="--force" in sys.argv)
    print(json.dumps(res, indent=2))
