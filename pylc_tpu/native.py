"""ctypes bindings for the native host library (native/pylc_host.cpp).

The compute path is JAX/XLA/Pallas on the device; this library covers
host-bound byte transforms (palette codecs, tile unfold, co-shuffle)
where a device round-trip would cost more than it saves.  Compiled on
first use with g++ (cached as native/build/libpylc_host.so); every entry
point has a numpy fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                    "native", "pylc_host.cpp")
_SO = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                   "native", "build", "libpylc_host.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or \
                    os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                os.makedirs(os.path.dirname(_SO), exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.class_encode_u8.argtypes = [
                u8p, ctypes.c_int64, u8p, ctypes.c_int32, ctypes.c_uint8,
                u8p]
            lib.colourize_u8.argtypes = [
                u8p, ctypes.c_int64, u8p, ctypes.c_int32, u8p]
            lib.unfold_tiles_u8.argtypes = [
                u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, u8p]
            lib.coshuffle_u8.argtypes = [
                u8p, u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_uint64]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def class_encode(rgb: np.ndarray, palette: np.ndarray,
                 default_class: int = 1) -> np.ndarray:
    """RGB [..., 3] u8 -> class map [...] u8 (host).

    Same semantics as pylc_tpu.ops.palette.class_encode including the
    default-to-class-1 quirk."""
    rgb = np.ascontiguousarray(rgb, np.uint8)
    palette = np.ascontiguousarray(palette, np.uint8)
    lib = _load()
    out = np.empty(rgb.shape[:-1], np.uint8)
    n_px = out.size
    if lib is None:  # numpy fallback
        keys = (rgb[..., 0].astype(np.int32) << 16) | \
               (rgb[..., 1].astype(np.int32) << 8) | rgb[..., 2]
        pal_keys = (palette[:, 0].astype(np.int32) << 16) | \
                   (palette[:, 1].astype(np.int32) << 8) | palette[:, 2]
        eq = keys[..., None] == pal_keys
        idx = np.argmax(eq, axis=-1)
        return np.where(np.any(eq, -1), idx, default_class).astype(np.uint8)
    lib.class_encode_u8(_u8p(rgb), n_px, _u8p(palette), len(palette),
                        default_class, _u8p(out))
    return out


def colourize(class_map: np.ndarray, palette: np.ndarray) -> np.ndarray:
    class_map = np.ascontiguousarray(class_map, np.uint8)
    palette = np.ascontiguousarray(palette, np.uint8)
    lib = _load()
    if lib is None:
        return palette[np.minimum(class_map, len(palette) - 1)]
    out = np.empty(class_map.shape + (3,), np.uint8)
    lib.colourize_u8(_u8p(class_map), class_map.size, _u8p(palette),
                     len(palette), _u8p(out))
    return out


def unfold_tiles(img: np.ndarray, tile: int, stride: int) -> np.ndarray:
    """[H, W, C] u8 -> [N, C, tile, tile] u8 (DB layout, torch tile
    order)."""
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    H, W, C = img.shape
    n = ((H - tile) // stride + 1) * ((W - tile) // stride + 1)
    lib = _load()
    if lib is None:
        nr = (H - tile) // stride + 1
        nc = (W - tile) // stride + 1
        out = np.empty((nr * nc, C, tile, tile), np.uint8)
        k = 0
        for i in range(nr):
            for j in range(nc):
                patch = img[i * stride:i * stride + tile,
                            j * stride:j * stride + tile]
                out[k] = np.transpose(patch, (2, 0, 1))
                k += 1
        return out
    out = np.empty((n, C, tile, tile), np.uint8)
    lib.unfold_tiles_u8(_u8p(img), H, W, C, tile, stride, _u8p(out))
    return out


def coshuffle(imgs: np.ndarray, masks: np.ndarray, seed: int = 0):
    """In-place paired shuffle (native Fisher-Yates) — returns the same
    arrays for convenience."""
    lib = _load()
    if lib is None:
        perm = np.random.default_rng(seed).permutation(len(imgs))
        return imgs[perm], masks[perm]
    imgs = np.ascontiguousarray(imgs)
    masks = np.ascontiguousarray(masks)
    lib.coshuffle_u8(_u8p(imgs), _u8p(masks), len(imgs),
                     imgs.strides[0], masks.strides[0],
                     ctypes.c_uint64(seed or 1).value)
    return imgs, masks
