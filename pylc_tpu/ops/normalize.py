"""Input normalization (device-side, fused into the forward program).

Reproduces the reference's exact normalization arithmetic
(models/model.py:416-445) including its scale quirks, because published
checkpoints were trained against them:

  - grayscale, profile stats:  ((x - mean(px_mean)) / mean(px_std)) / 255
  - grayscale, defaults:        (x - 142.01) / 23.66          (NO /255)
  - colour, either stats:      ((x - px_mean) / px_std) / 255

The reference runs this on host per batch; here it is a jnp op traced
into the jitted train/predict step so the uint8 -> f32 convert, subtract,
scale all fuse into the first conv's input pipeline on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def normalize_image(img, px_mean, px_std, ch: int,
                    default: bool = False,
                    gs_default=(142.01, 23.66)):
    """Normalize [N, H, W, C] image batch (uint8 or float).

    px_mean / px_std: profile stats (scalar-like for ch=1, length-3 for
    ch=3).  ``default`` selects the hardcoded fallback stats as in
    reference model.py:430-443.
    """
    x = img.astype(jnp.float32)
    if ch == 1:
        if default:
            return (x - gs_default[0]) / gs_default[1]
        mean = float(np.mean(px_mean))
        std = float(np.mean(px_std))
        return ((x - mean) / std) / 255.0
    mean = jnp.asarray(np.asarray(px_mean, dtype=np.float32))
    std = jnp.asarray(np.asarray(px_std, dtype=np.float32))
    return ((x - mean) / std) / 255.0
