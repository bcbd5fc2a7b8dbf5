"""Host-side image IO: decode, scale, tile-grid fit, file collation.

Decode stays on host (cv2), everything after decode is device work.
Behavior parity with reference utils/tools.py:

  - get_image (:77-148): imread forced 8-bit, BGR->RGB, grayscale
    detection by channel equality, min-dim>=tile_size scale clamp.
    Deviation (docs/DEVIATIONS.md): colour->grayscale conversion is
    applied automatically instead of via an interactive input() prompt.
  - adjust_to_tile (:151-206): width floored to tile multiple, height
    aspect-scaled then floored, crop off the top.  Exact integer math
    shared with pylc_tpu.ops.tiles.adjust_to_tile_dims.
  - collate / load_files (:597-680): image(.tif/.tiff/.jpg/.jpeg) <->
    mask(.png) pairing by basename; raises instead of exit(1).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Union

import cv2
import numpy as np

from pylc_tpu.ops.tiles import adjust_to_tile_dims

IMG_EXTS = (".tif", ".tiff", ".jpg", ".jpeg")
MASK_EXTS = (".png",)


def is_grayscale(img: np.ndarray) -> bool:
    return bool(np.array_equal(img[..., 0], img[..., 1]) and
                np.array_equal(img[..., 0], img[..., 2]))


def get_image(img_path: str, ch: int = 3, scale: Optional[float] = None,
              tile_size: int = 512, interpolate=cv2.INTER_AREA):
    """Load an image as uint8, optionally scaled.

    Returns (img, w, h, w_resized, h_resized); grayscale images come
    back as [H, W], colour as [H, W, 3] RGB.
    """
    assert ch in (1, 3), f"Invalid number of input channels: {ch}."
    if not os.path.exists(img_path):
        raise FileNotFoundError(f"Image path {img_path} does not exist.")

    probe = cv2.imread(img_path, cv2.IMREAD_COLOR)
    if probe is None:
        raise IOError(f"Could not decode image {img_path}.")
    if is_grayscale(probe) and ch == 3:
        raise ValueError(
            f"Input image {img_path} is grayscale but process expects "
            "colour (RGB).")

    if ch == 3:
        img = cv2.cvtColor(probe, cv2.COLOR_BGR2RGB)
    else:
        img = cv2.imread(img_path, cv2.IMREAD_GRAYSCALE)

    h, w = img.shape[:2]
    h_r, w_r = h, w
    if scale:
        min_dim = min(h, w)
        if min_dim < tile_size:
            scale = tile_size / min_dim  # clamp (reference tools.py:139-145)
        dim = (int(scale * w), int(scale * h))
        img = cv2.resize(img, dim, interpolation=interpolate)
        h_r, w_r = img.shape[:2]
    return img, w, h, w_r, h_r


def adjust_to_tile(img: np.ndarray, tile_size: int, stride: int,
                   interpolate=cv2.INTER_AREA):
    """Resize+crop an image to the tile grid.

    Returns (img, w_fitted, h_fitted, h_crop)."""
    h, w = img.shape[:2]
    w_fit, h_fit, h_crop = adjust_to_tile_dims(w, h, tile_size, stride)
    img = cv2.resize(img, (w_fit, h_fit + h_crop), interpolation=interpolate)
    img = img[h_crop:]
    return img, w_fit, h_fit, h_crop


def load_files(path: str, exts) -> List[str]:
    if not os.path.exists(path):
        raise FileNotFoundError(f"File not found: {path}")
    if os.path.isfile(path):
        ext = os.path.splitext(path)[1]
        if ext not in exts:
            raise ValueError(f"File {path} of type {ext} is invalid.")
        return [path]
    return sorted(os.path.join(path, f) for f in os.listdir(path)
                  if any(f.endswith(e) for e in exts))


def collate(img_dir: str, mask_dir: Optional[str] = None
            ) -> List[Union[str, Dict[str, str]]]:
    """Pair images with masks by basename; with no mask dir, return the
    image list."""
    img_files = load_files(img_dir, IMG_EXTS)
    if not mask_dir:
        return img_files
    mask_files = load_files(mask_dir, MASK_EXTS)
    masks = {os.path.splitext(os.path.basename(f))[0]: f for f in mask_files}
    pairs = []
    used = set()
    for f in img_files:
        stem = os.path.splitext(os.path.basename(f))[0]
        if stem not in masks:
            raise FileNotFoundError(f"Mask not found for image {stem}.")
        pairs.append({"img": f, "mask": masks[stem]})
        used.add(stem)
    unused = [v for k, v in masks.items() if k not in used]
    if unused:
        raise FileNotFoundError(
            "Image not found for mask(s): " + ", ".join(unused))
    return pairs


def rgb2hex(color) -> str:
    """RGB triple -> hex string (reference utils/tools.py:24-39)."""
    r, g, b = (int(c) for c in color[:3])
    return f"#{r:02x}{g:02x}{b:02x}"
