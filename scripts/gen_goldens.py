#!/usr/bin/env python3
"""Generate golden-parity fixtures by RUNNING the reference implementation.

Runs /root/reference's own functions (torch CPU) on deterministic
synthetic inputs and records their outputs to tests/golden/*.npz.  The
committed fixtures make tests/test_golden_parity.py hermetic — the
reference tree is only needed to regenerate.

Usage:  python scripts/gen_goldens.py [reference_dir] [out_dir]
"""

import os
import subprocess
import sys
import tempfile

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
if __name__ == "__main__":
    # CLI overrides only — reading sys.argv at import time picked up
    # pytest's own flags when tests imported this module to regenerate
    # missing fixtures
    if len(sys.argv) > 1:
        REF = sys.argv[1]
    if len(sys.argv) > 2:
        OUT = sys.argv[2]

# This script body executes INSIDE the reference checkout (cwd=REF) so
# the reference's relative schema paths resolve.
DRIVER = r'''
import sys, numpy as np, torch
sys.path.insert(0, ".")
rng = np.random.default_rng(1234)
out = {}

# ---- class_encode / colourize (utils/tools.py:322-449) ----
from utils.tools import class_encode, colourize, map_palette, adjust_to_tile
from config import defaults
palette = defaults.palette_rgb
classes = rng.integers(0, defaults.n_classes, size=(2, 24, 24)).astype(np.uint8)
rgb = np.asarray(palette, np.uint8)[classes]              # [2,24,24,3]
# plant unmatched pixels to capture the default-to-1 quirk
rgb[0, :3, :3] = [7, 7, 7]
t_in = torch.tensor(np.moveaxis(rgb, -1, 1))              # NCHW
enc = class_encode(t_in, palette).numpy()
out["encode_in_rgb"] = rgb
out["encode_out"] = enc
col = colourize(enc.astype(np.uint8), defaults.n_classes, palette=palette)
out["colourize_out"] = col

# ---- map_palette (b-to-a) ----
key = np.array([0, 1, 1, 2, 3, 3, 4, 5, 6, 7, 8])
cmap = rng.integers(0, 11, size=(5, 6)).astype(np.uint8)
out["map_palette_in"] = cmap
out["map_palette_key"] = key
out["map_palette_out"] = map_palette(torch.tensor(cmap), key).numpy()

# ---- adjust_to_tile (utils/tools.py:151-206) ----
dims = []
for (w, h) in [(3871, 2592), (4000, 3000), (1024, 700), (777, 1333)]:
    img = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
    fitted, wf, hf, crop = adjust_to_tile(img, 512, 256, 3)
    dims.append([w, h, wf, hf, crop])
out["adjust_dims"] = np.asarray(dims)

# ---- reconstruct (utils/tools.py:209-319) ----
tile, stride, C = 64, 32, 9
n_rows, n_cols = 3, 4
h = (n_rows - 1) * stride + tile
w = (n_cols - 1) * stride + tile
logits = (rng.normal(size=(n_rows * n_cols, C, tile, tile)) * 3).astype(np.float32)

class Meta:  # reconstruct reads meta attributes
    pass
meta = Meta()
meta.extract = {"w_fitted": w, "h_fitted": h, "w_scaled": w, "h_scaled": h,
                "offset": 0}
meta.tile_size = tile
meta.stride = stride
meta.palette_rgb = palette
meta.n_classes = C
from utils.tools import reconstruct
mask_rgb = reconstruct([torch.tensor(logits)], meta)
out["reconstruct_logits"] = logits
out["reconstruct_mask_rgb"] = mask_rgb.astype(np.uint8)

# ---- multi-loss values (models/modules/loss.py) ----
# NB: weights=None crashes the reference (its np.array(None) object-array
# passes the `is not None` check, loss.py:46,60-63 — DEVIATIONS.md F9);
# unweighted CE with weights=ones is numerically identical.
from models.modules.loss import MultiLoss
ml = MultiLoss(
    loss_weights={"weighted": False, "weights": np.ones(C, np.float32),
                  "ce": 0.5, "dice": 0.5, "focal": 0.5},
    schema={"n_classes": C,
            "class_codes": defaults.class_codes,
            "class_labels": defaults.class_labels})
pred = torch.tensor(rng.normal(size=(2, C, 16, 16)).astype(np.float32))
tgt = torch.tensor(rng.integers(0, C, size=(2, 16, 16)))
total = ml.forward(pred, tgt)
out["loss_pred"] = pred.numpy()
out["loss_target"] = tgt.numpy().astype(np.int32)
out["loss_values"] = np.array([float(ml.ce), float(ml.dsc), float(ml.fl),
                               float(total)], np.float64)

# ---- profile weights formula (utils/profile.py:129-130) ----
probs = rng.random(C); probs = probs / probs.sum()
weights = 1 / (np.log(1.02 + probs)); weights = weights / np.max(weights)
out["profile_probs"] = probs
out["profile_weights"] = weights

np.savez_compressed(sys.argv[1], **out)
print("goldens written:", sys.argv[1])
'''


def main():
    os.makedirs(OUT, exist_ok=True)
    out_path = os.path.abspath(os.path.join(OUT, "reference_goldens.npz"))
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(DRIVER)
        driver = f.name
    try:
        subprocess.run([sys.executable, driver, out_path],
                       cwd=REF, check=True)
    finally:
        os.unlink(driver)




# ----------------------------------------------------------------- #
# Model-conversion goldens: construct the reference torch DeepLab,
# save a reference-format .pth + its logits on a fixed input.
# ----------------------------------------------------------------- #

MODEL_DRIVER = r'''
import sys, numpy as np, torch
sys.path.insert(0, ".")
torch.manual_seed(0)
from models.architectures.deeplab import DeepLab
from config import defaults

out_pth, out_npz, backbone = sys.argv[1], sys.argv[2], sys.argv[3]
net = DeepLab(activ_func=torch.nn.ReLU(inplace=True),
              normalizer=torch.nn.BatchNorm2d,
              backbone=backbone, n_classes=9, in_channels=3,
              pretrained=False)
net.eval()
# randomize BN running stats so conversion of batch_stats is exercised
with torch.no_grad():
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)

rng = np.random.default_rng(42)
x = rng.normal(size=(1, 3, 128, 128)).astype(np.float32)
with torch.no_grad():
    y = net(torch.tensor(x)).numpy()

meta = {k: v for k, v in vars(defaults).items()
        if isinstance(v, (int, float, str, bool, list, tuple, type(None)))}
meta.update({"arch": "deeplab", "backbone": backbone, "ch": 3})
torch.save({"model": net.state_dict(), "meta": meta}, out_pth)
np.savez_compressed(out_npz, x=x, logits=y)
print("model golden written:", out_pth, y.shape)
'''


def gen_model_goldens():
    os.makedirs(OUT, exist_ok=True)
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(MODEL_DRIVER)
        driver = f.name
    try:
        for backbone in ("resnet", "xception"):
            pth = os.path.abspath(os.path.join(
                OUT, f"ref_deeplab_{backbone}.pth"))
            npz = os.path.abspath(os.path.join(
                OUT, f"ref_deeplab_{backbone}_io.npz"))
            subprocess.run([sys.executable, driver, pth, npz, backbone],
                           cwd=REF, check=True)
    finally:
        os.unlink(driver)


if __name__ == "__main__":
    main()
    gen_model_goldens()
