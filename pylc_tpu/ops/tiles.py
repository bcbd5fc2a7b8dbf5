"""Tile-grid geometry: fit, unfold, and overlap-stitch.

This is the spatial scale-out core of PyLC-TPU.  Megapixel oblique
photographs don't fit through the network whole, so they are decomposed
into an overlapping 512x512 tile grid, batched through the model, and
re-fused.  The reference does the decomposition with torch ``unfold`` on
host (utils/extract.py:279-310) and the fusion with a sequential
pairwise softmax-averaging loop on host (utils/tools.py:209-319).  Here
both are single device-side XLA programs:

  - ``unfold_tiles``: reshape/static-slice tiling (no data-dependent
    shapes; XLA lowers it to pure layout moves).
  - ``stitch_probs``: overlap-add in *block space*.  With k = tile/stride
    sub-blocks per tile side, sub-block (a, b) of grid tile (i, j) lands
    on canvas block (i+a, j+b); the whole stitch is k^2 shifted adds of a
    reshaped tile tensor — fully vectorized, no scatter, no serial loop.
    Final probabilities are the mean over all tiles covering a pixel.

Equivalence note: for stride = tile/2 the reference averages the two
softmaxes on interior seams (same as our mean) but re-softmaxes
already-averaged probabilities at row seams, which perturbs corner
pixels' probabilities while preserving per-pixel argmax ordering almost
everywhere.  tests/test_tiles.py checks argmax agreement against a
faithful numpy port of the reference algorithm.
"""

from __future__ import annotations

import functools
from math import ceil
from typing import Tuple

import jax
import jax.numpy as jnp


def adjust_to_tile_dims(w: int, h: int, tile_size: int, stride: int
                        ) -> Tuple[int, int, int]:
    """Target (w_fitted, h_fitted, h_crop) for fitting an image onto the
    tile grid.  Exact integer math of reference utils/tools.py:151-206:
    width floored to a tile multiple, height scaled preserving aspect then
    floored to a tile multiple, crop taken off the *top*.  (With this
    formula h_crop is always 0 — preserved for metadata parity.)
    """
    assert tile_size % stride == 0 and stride <= tile_size, \
        "Tile size must be multiple of stride."
    aspect = w / h
    w_scaled = (w // tile_size) * tile_size
    h_scaled = (ceil(w_scaled / aspect) // tile_size) * tile_size
    h_tgt = int(h_scaled / tile_size) * tile_size
    h_crop = h_scaled - h_tgt
    return w_scaled, h_scaled - h_crop, h_crop


def grid_dims(w: int, h: int, tile_size: int, stride: int
              ) -> Tuple[int, int]:
    """Number of tile-grid (rows, cols) — the reference's
    n_strides_in_col/row (utils/tools.py:235-236)."""
    n_cols = w // stride - 1 if stride < tile_size else w // stride
    n_rows = h // stride - 1 if stride < tile_size else h // stride
    return n_rows, n_cols


@functools.partial(jax.jit, static_argnums=(1, 2))
def unfold_tiles(img: jnp.ndarray, tile_size: int, stride: int
                 ) -> jnp.ndarray:
    """Split an image [H, W, C] into tiles [N, tile, tile, C].

    Tile order is row-major over the (row, col) grid, matching torch
    ``unfold(0).unfold(1)`` (reference utils/extract.py:301-308) so DBs
    are sample-for-sample interchangeable.

    H and W must satisfy (dim - tile_size) % stride == 0 (guaranteed by
    ``adjust_to_tile_dims``).
    """
    H, W, C = img.shape
    n_rows = (H - tile_size) // stride + 1
    n_cols = (W - tile_size) // stride + 1
    # drop the remainder that doesn't fit the grid (torch unfold
    # semantics — e.g. multi-scale extraction on non-multiple dims)
    Heff = (n_rows - 1) * stride + tile_size
    Weff = (n_cols - 1) * stride + tile_size
    if (Heff, Weff) != (H, W):
        img = img[:Heff, :Weff]
        H, W = Heff, Weff

    if stride == tile_size:
        # pure reshape/transpose — zero-copy layout change under XLA
        t = img.reshape(n_rows, tile_size, n_cols, tile_size, C)
        return t.transpose(0, 2, 1, 3, 4).reshape(-1, tile_size, tile_size, C)

    k = tile_size // stride
    # pad H, W up to block multiples so the block reshape is exact
    Hb = (n_rows - 1 + k) * stride
    Wb = (n_cols - 1 + k) * stride
    padded = jnp.pad(img, ((0, Hb - H), (0, Wb - W), (0, 0)))
    # block decomposition: [Rb, s, Cb, s, C] -> blocks [Rb, Cb, s, s, C]
    Rb, Cb = Hb // stride, Wb // stride
    blocks = padded.reshape(Rb, stride, Cb, stride, C).transpose(0, 2, 1, 3, 4)
    # tile (i, j) = blocks[i:i+k, j:j+k] assembled; gather k*k shifted views
    rows = []
    for a in range(k):
        cols = []
        for b in range(k):
            cols.append(blocks[a:a + n_rows, b:b + n_cols])  # [nR,nC,s,s,C]
        rows.append(jnp.stack(cols, axis=2))  # [nR, nC, k, s, s, C]
    t = jnp.stack(rows, axis=2)  # [nR, nC, k, k, s, s, C]
    # [nR, nC, k, s, k, s, C] -> [N, tile, tile, C]
    t = t.transpose(0, 1, 2, 4, 3, 5, 6)
    return t.reshape(n_rows * n_cols, tile_size, tile_size, C)


def accumulate_blocks(tile_probs: jnp.ndarray, n_rows: int, n_cols: int,
                      tile_size: int, stride: int, tile_weights=None):
    """Overlap-ADD tile maps into canvas block space (no division).

    Returns (acc [Rb, Cb, s, s, C] f32, cnt [Rb, Cb, 1, 1, 1] f32) with
    Rb = n_rows - 1 + k block rows.  Shared by the single-device stitch
    and the halo-exchange sharded stitch
    (pylc_tpu/parallel/sharded_stitch.py), whose shards each accumulate
    their local tile rows with this function.

    tile_weights: optional [N] per-tile weights applied to both the
    probability sums and the coverage counts — weight-0 tiles are
    invisible (the sharded stitch pads the grid to an even per-shard
    row count with zero-weight tiles).
    """
    N, T, T2, C = tile_probs.shape
    assert T == tile_size and T2 == tile_size
    k = tile_size // stride
    s = stride
    Rb = n_rows - 1 + k  # canvas blocks (rows)
    Cb = n_cols - 1 + k

    # [nR, nC, k, s, k, s, C] -> sub-blocks [nR, nC, k, k, s, s, C]
    t = tile_probs.reshape(n_rows, n_cols, k, s, k, s, C)
    t = t.transpose(0, 1, 2, 4, 3, 5, 6)
    if tile_weights is not None:
        w = tile_weights.astype(jnp.float32).reshape(n_rows, n_cols)
    else:
        w = None

    # accumulate in f32 regardless of input precision (tile probs may
    # arrive bf16 to halve their HBM footprint at 10MP scale)
    acc = jnp.zeros((Rb, Cb, s, s, C), jnp.float32)
    cnt = jnp.zeros((Rb, Cb, 1, 1, 1), jnp.float32)
    for a in range(k):
        for b in range(k):
            part = t[:, :, a, b].astype(jnp.float32)
            if w is None:
                acc = acc.at[a:a + n_rows, b:b + n_cols].add(part)
                cnt = cnt.at[a:a + n_rows, b:b + n_cols].add(1.0)
            else:
                wb = w[:, :, None, None, None]
                acc = acc.at[a:a + n_rows, b:b + n_cols].add(part * wb)
                cnt = cnt.at[a:a + n_rows, b:b + n_cols].add(wb)
    return acc, cnt


def blocks_to_canvas(acc: jnp.ndarray) -> jnp.ndarray:
    """[Rb, Cb, s, s, C] block space -> [Rb*s, Cb*s, C] canvas."""
    Rb, Cb, s, s2, C = acc.shape
    return acc.transpose(0, 2, 1, 3, 4).reshape(Rb * s, Cb * s, C)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def stitch_probs(tile_probs: jnp.ndarray, n_rows: int, n_cols: int,
                 tile_size: int, stride: int) -> jnp.ndarray:
    """Overlap-average tile probability maps into a full canvas.

    Parameters
    ----------
    tile_probs: [N, tile, tile, C] per-tile class probabilities in the
        row-major grid order produced by ``unfold_tiles``.
    Returns [H, W, C] mean probabilities, H = (n_rows-1)*stride + tile.

    Device-side replacement for the reference's sequential host stitch
    (utils/tools.py:209-319); see module docstring for the math.
    """
    acc, cnt = accumulate_blocks(tile_probs, n_rows, n_cols, tile_size,
                                 stride)
    return blocks_to_canvas(acc / cnt)


def stitch_logits_to_mask(tile_logits, n_rows, n_cols, tile_size, stride):
    """softmax -> stitch -> argmax, fused under one jit.

    Returns [H, W] uint8 class map.
    """
    probs = jax.nn.softmax(tile_logits, axis=-1)
    canvas = stitch_probs(probs, n_rows, n_cols, tile_size, stride)
    return jnp.argmax(canvas, axis=-1).astype(jnp.uint8)
