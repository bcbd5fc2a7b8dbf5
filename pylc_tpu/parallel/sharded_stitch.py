"""Spatially-sharded overlap stitch with ICI halo exchange.

SURVEY.md §5.7 calls the reference's tile/stitch decomposition the
convnet analogue of blockwise long-context processing (reference
utils/tools.py:209-319 re-fuses an overlapping tile grid sequentially
on host).  pylc_tpu already batch-shards tiles across chips
(tests/test_sharded_infer.py); this module implements the second
scale-out axis from §5.7(b): sharding the *canvas itself* over the mesh
so a stitched probability map larger than one chip's HBM (e.g. a
gigapixel panorama at f32×C) never materializes on a single device.

Layout: tile-grid ROWS are sharded over the 'data' axis (row-major
tile order keeps each shard's tiles contiguous).  Each shard overlap-
adds its local tile rows into its local band of canvas blocks plus a
(k-1)-block-row spill that belongs to the NEXT shard — exactly a halo.
One `lax.ppermute` ships every shard's spill to its right neighbour
over ICI; the receiver folds it into its band head.  The last shard's
spill is the global canvas tail and is returned alongside the bands.

Cost: the halo is (k-1)·stride rows of f32 [W, C] per boundary —
independent of the canvas height — so the exchange is O(W·C·stride)
per chip while compute and memory scale 1/n_devices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pylc_tpu.ops.tiles import accumulate_blocks, blocks_to_canvas


def stitch_probs_sharded(tile_probs, n_rows: int, n_cols: int,
                         tile_size: int, stride: int, mesh: Mesh,
                         axis_name: str = "data") -> jnp.ndarray:
    """Overlap-average [N, t, t, C] tile probabilities into an [H, W, C]
    canvas, with tile rows and the canvas sharded over ``axis_name``.

    Requirements: ``n_rows`` divisible by the mesh axis size, and
    ``n_rows / n_devices >= k - 1`` (the spill must reach only the
    immediate neighbour).  Raises ValueError otherwise — callers should
    check :func:`can_shard` first and use the single-device
    ``stitch_probs`` when it returns False.
    """
    n_dev = mesh.shape[axis_name]
    k = tile_size // stride
    s = stride
    if not can_shard(n_rows, tile_size, stride, n_dev):
        raise ValueError(
            f"cannot shard {n_rows} tile rows over {n_dev} devices at "
            f"tile {tile_size}/stride {stride} (need n_rows % n_dev == 0 "
            f"and n_rows/n_dev >= k-1={k - 1}); use stitch_probs")
    nL = n_rows // n_dev
    spill_rows = k - 1

    def shard_fn(tp):
        # tp: [nL * n_cols, t, t, C] — this shard's tile rows
        acc, cnt = accumulate_blocks(tp, nL, n_cols, tile_size, stride)
        # local blocks span [nL + k - 1] rows: the band we own plus the
        # spill belonging to the right neighbour
        keep_a, spill_a = acc[:nL], acc[nL:]
        keep_c, spill_c = cnt[:nL], cnt[nL:]
        if spill_rows and n_dev > 1:
            perm = [(i, i + 1) for i in range(n_dev - 1)]
            halo_a = jax.lax.ppermute(spill_a, axis_name, perm)
            halo_c = jax.lax.ppermute(spill_c, axis_name, perm)
            keep_a = keep_a.at[:spill_rows].add(halo_a)
            keep_c = keep_c.at[:spill_rows].add(halo_c)
        band = blocks_to_canvas(keep_a / keep_c)      # [nL*s, W, C]
        if not spill_rows:
            return (band,)
        return band, spill_a, spill_c

    if spill_rows:
        bands, spills_a, spills_c = shard_map(
            shard_fn, mesh=mesh,
            in_specs=P(axis_name),
            out_specs=(P(axis_name), P(axis_name), P(axis_name)),
        )(tile_probs)
        # bands is the globally-sharded [n_rows*s, W, C] body; the tail
        # (k-1 block rows) comes from the LAST shard's spill only
        tail = blocks_to_canvas(
            spills_a[-spill_rows:] / spills_c[-spill_rows:])
        return jnp.concatenate([bands, tail], axis=0)

    # k == 1: no overlap, no halo — pure banded accumulate
    (bands,) = shard_map(shard_fn, mesh=mesh, in_specs=P(axis_name),
                         out_specs=(P(axis_name),))(tile_probs)
    return bands


def can_shard(n_rows: int, tile_size: int, stride: int,
              n_dev: int) -> bool:
    k = tile_size // stride
    return (n_dev >= 1 and n_rows % n_dev == 0
            and n_rows // n_dev >= k - 1)


def shard_tiles_by_row(mesh: Mesh, tile_probs, axis_name: str = "data"):
    """Place a [N, t, t, C] row-major tile array with tile ROWS sharded
    over the mesh (leading-dim sharding is row sharding because the
    grid order is row-major)."""
    return jax.device_put(
        tile_probs, NamedSharding(mesh, P(axis_name, None, None, None)))
