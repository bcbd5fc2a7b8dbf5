#!/usr/bin/env python3
"""Generate golden fixtures for the MobileNetV2 / DRN-D-54 backbones by
RUNNING the reference backbone modules (torch CPU).

The reference DeepLab cannot construct these backbones
(models/architectures/deeplab.py:23-26 wires only resnet/xception), so
unlike the full-model goldens these drive the backbone nn.Modules
directly: random params AND randomized BN running statistics (so the
converter's stat mapping is actually exercised), eval-mode forward on a
fixed input, state_dict + (feat, low_level) recorded.

Usage:  python scripts/gen_backbone_goldens.py [reference_dir] [out_dir]
"""

import os
import subprocess
import sys
import tempfile

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
if __name__ == "__main__":
    if len(sys.argv) > 1:
        REF = sys.argv[1]
    if len(sys.argv) > 2:
        OUT = sys.argv[2]

# Executes INSIDE the reference checkout (cwd=REF).
DRIVER = r'''
import sys
import numpy as np
import torch
import torch.nn as nn
sys.path.insert(0, ".")

pth, npz, which = sys.argv[1], sys.argv[2], sys.argv[3]
torch.manual_seed(0)
rng = np.random.default_rng(5)

if which == "mobilenet":
    from models.backbone.mobilenet import MobileNetV2
    net = MobileNetV2(output_stride=16, BatchNorm=nn.BatchNorm2d,
                      pretrained=False)
else:
    from models.backbone.drn import DRN, Bottleneck
    # drn_d_54 config (drn.py:384-392) without the zoo download
    net = DRN(Bottleneck, [1, 1, 3, 4, 6, 3, 1, 1], arch="D",
              BatchNorm=nn.BatchNorm2d)

# randomize BN affine + running stats: freshly-initialized BN (mean 0,
# var 1, weight 1, bias 0) would hide converter stat-mapping bugs
with torch.no_grad():
    for m in net.modules():
        if isinstance(m, nn.BatchNorm2d):
            for t, gen in ((m.weight, rng.normal(1.0, 0.2, m.weight.shape)),
                           (m.bias, rng.normal(0.0, 0.2, m.bias.shape)),
                           (m.running_mean,
                            rng.normal(0.0, 0.5, m.running_mean.shape)),
                           (m.running_var,
                            rng.random(m.running_var.shape) + 0.5)):
                t.copy_(torch.tensor(gen, dtype=torch.float32))

net.eval()
x = rng.normal(0, 1, (1, 3, 64, 64)).astype(np.float32)
with torch.no_grad():
    feat, ll = net(torch.tensor(x))
torch.save(net.state_dict(), pth)
np.savez_compressed(npz, x=x, feat=feat.numpy(), low_level=ll.numpy())
print(which, "golden:", feat.shape, ll.shape, "->", pth)
'''


def main():
    os.makedirs(OUT, exist_ok=True)
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(DRIVER)
        driver = f.name
    try:
        for which in ("mobilenet", "drn"):
            pth = os.path.abspath(
                os.path.join(OUT, f"ref_backbone_{which}.pth"))
            npz = os.path.abspath(
                os.path.join(OUT, f"ref_backbone_{which}_io.npz"))
            subprocess.run([sys.executable, driver, pth, npz, which],
                           cwd=REF, check=True)
    finally:
        os.unlink(driver)


if __name__ == "__main__":
    main()
