"""Full-image inference: tile -> batched forward -> stitch -> (CRF) ->
palette decode.  This is the benchmark surface (Megapixels/sec/chip).

The reference runs this as host tiling -> per-batch device forward ->
host sequential stitch -> Python-loop colourize (test.py:23-115,
utils/tools.py:209-319).  Here the whole chain after decode is
device-resident:

  host decode -> ONE device_put of the fitted image
    -> XLA unfold (layout moves only)
    -> batched forward over the tile axis (MXU)
    -> softmax + overlap-add stitch (k^2 shifted adds)
    -> optional dense-CRF mean-field refinement
    -> argmax + palette LUT
  -> ONE device_get of the final [H, W, 3] uint8 mask.

U-Net note: the reference's own test path is broken for U-Net (its
stitcher assumes model output == tile_size, but valid-conv U-Net emits
324px; reconstruct would raise).  Defined semantics here: valid-conv
logits are upsampled to tile size (align-corners bilinear) before
stitching.  Recorded in docs/DEVIATIONS.md.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pylc_tpu.config import Config
from pylc_tpu.ops.palette import colourize
from pylc_tpu.ops.tiles import grid_dims, stitch_probs, unfold_tiles
from pylc_tpu.models.layers import resize_bilinear_align_corners
from pylc_tpu.utils.imageio import adjust_to_tile, get_image


def _pad_batch(tiles: jnp.ndarray, batch: int) -> Tuple[jnp.ndarray, int]:
    n = tiles.shape[0]
    n_pad = (-n) % batch
    if n_pad:
        tiles = jnp.concatenate(
            [tiles, jnp.repeat(tiles[-1:], n_pad, axis=0)], axis=0)
    return tiles, n


class Segmenter:
    """Batched tile->mask inference engine for one loaded model."""

    def __init__(self, cfg: Config, state, predict_fn: Callable,
                 batch_size: int = 8, crf: Optional[Callable] = None):
        self.cfg = cfg
        self.state = state
        self.predict = predict_fn
        self.batch_size = batch_size
        self.crf = crf
        self._infer_jit = None

    # ------------------------------------------------------------------ #

    def _tile_logits(self, img_dev: jnp.ndarray, stride: int) -> jnp.ndarray:
        """Unfold + batched forward. Returns [N, tile, tile, C] logits."""
        cfg = self.cfg
        tiles = unfold_tiles(img_dev, cfg.tile_size, stride)  # [N,t,t,ch]
        tiles, n_real = _pad_batch(tiles, self.batch_size)
        n_batches = tiles.shape[0] // self.batch_size
        tiles = tiles.reshape((n_batches, self.batch_size) + tiles.shape[1:])

        def body(carry, batch_tiles):
            logits = self.predict(self.state, batch_tiles)
            if logits.shape[1] != cfg.tile_size:  # valid-conv U-Net
                logits = resize_bilinear_align_corners(
                    logits, cfg.tile_size, cfg.tile_size)
            return carry, logits

        _, out = jax.lax.scan(body, 0, tiles)
        out = out.reshape((-1,) + out.shape[2:])
        return out[:n_real]

    def segment_array(self, img: np.ndarray, stride: Optional[int] = None
                      ) -> Dict:
        """Segment a fitted [H, W, C] uint8 image (H, W tile multiples).

        Returns dict with 'mask_rgb' [H, W, 3] u8, 'class_map' [H, W] u8,
        'probs' (device array), and timing."""
        cfg = self.cfg
        stride = stride or cfg.tile_size // 2  # test default (test.py:63)
        if img.ndim == 2:
            img = img[..., None]
        H, W = img.shape[:2]
        n_rows, n_cols = grid_dims(W, H, cfg.tile_size, stride)

        t0 = time.perf_counter()
        img_dev = jnp.asarray(img)  # single host->HBM transfer
        logits = self._tile_logits(img_dev, stride)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        canvas = stitch_probs(probs, n_rows, n_cols, cfg.tile_size, stride)
        if self.crf is not None:
            canvas = self.crf(canvas, img_dev)
        class_map = jnp.argmax(canvas, axis=-1).astype(jnp.uint8)
        mask_rgb = colourize(class_map, cfg.palette_rgb)
        mask_rgb = np.asarray(mask_rgb)  # single device->host transfer
        dt = time.perf_counter() - t0
        return {
            "mask_rgb": mask_rgb,
            "class_map": np.asarray(class_map),
            "probs": canvas,
            "seconds": dt,
            "megapixels": H * W / 1e6,
        }

    def segment_file(self, img_path: str, scale: Optional[float] = None,
                     stride: Optional[int] = None) -> Dict:
        """Full reference test-path flow for one image file: decode ->
        scale -> fit to tile grid -> segment -> resize back to scaled
        dims (reference utils/tools.py:316-317, nearest)."""
        import cv2

        cfg = self.cfg
        stride = stride or cfg.tile_size // 2
        img, w_full, h_full, w_scaled, h_scaled = get_image(
            img_path, cfg.ch, scale=scale or cfg.scale,
            tile_size=cfg.tile_size)
        fitted, w_fit, h_fit, offset = adjust_to_tile(
            img, cfg.tile_size, stride)
        res = self.segment_array(fitted, stride)
        # resize predicted mask back to the scaled (pre-fit) dimensions
        res["mask_rgb"] = cv2.resize(
            res["mask_rgb"], (w_scaled, h_scaled),
            interpolation=cv2.INTER_NEAREST)
        res["extract"] = {
            "fid": (img_path.split("/")[-1].replace(".", "_")
                    + "_scale_" + str(scale or cfg.scale)),
            "n": grid_dims(w_fit, h_fit, cfg.tile_size, stride)[0] *
                 grid_dims(w_fit, h_fit, cfg.tile_size, stride)[1],
            "w_full": w_full, "h_full": h_full,
            "w_scaled": w_scaled, "h_scaled": h_scaled,
            "w_fitted": w_fit, "h_fitted": h_fit, "offset": offset,
        }
        return res
