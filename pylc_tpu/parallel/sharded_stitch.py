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
tile order keeps each shard's tiles contiguous).  Grids whose row count
doesn't divide the mesh are padded with ZERO-WEIGHT tile rows — the
weights flow into both the probability sums and the coverage counts
(ops/tiles.py::accumulate_blocks), so padding is invisible to the
average.  Each shard overlap-adds its local rows into its band of
canvas blocks plus a (k-1)-block-row spill that belongs to the NEXT
shard — exactly a halo.  One `lax.ppermute` ships every shard's spill
to its right neighbour over ICI; the receiver folds it into its band
head.  The last shard's spill is the global canvas tail.

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


def can_shard(n_rows: int, tile_size: int, stride: int,
              n_dev: int) -> bool:
    """Whether the sharded stitch supports this geometry: the per-shard
    row count (after zero-weight padding) must cover the k-1 spill
    rows, i.e. the halo reaches only the immediate neighbour."""
    k = tile_size // stride
    n_pad = -(-n_rows // n_dev) * n_dev
    return n_dev >= 1 and n_pad // n_dev >= max(1, k - 1)


def stitch_probs_sharded(tile_probs, n_rows: int, n_cols: int,
                         tile_size: int, stride: int, mesh: Mesh,
                         axis_name: str = "data") -> jnp.ndarray:
    """Overlap-average [N, t, t, C] tile probabilities into an [H, W, C]
    canvas, with tile rows and the canvas sharded over ``axis_name``.

    ``n_rows`` need not divide the mesh — the grid is padded with
    zero-weight rows.  Raises ValueError when the per-shard row count
    can't cover the overlap spill (:func:`can_shard`); fall back to the
    single-device ``stitch_probs`` there.
    """
    n_dev = mesh.shape[axis_name]
    k = tile_size // stride
    s = stride
    if not can_shard(n_rows, tile_size, stride, n_dev):
        raise ValueError(
            f"cannot shard {n_rows} tile rows over {n_dev} devices at "
            f"tile {tile_size}/stride {stride} (per-shard rows must be "
            f">= k-1 = {k - 1}); use stitch_probs")
    n_rows_p = -(-n_rows // n_dev) * n_dev
    nL = n_rows_p // n_dev
    spill_rows = k - 1
    if n_rows_p != n_rows:
        pad = (n_rows_p - n_rows) * n_cols
        tile_probs = jnp.concatenate(
            [tile_probs,
             jnp.zeros((pad,) + tile_probs.shape[1:], tile_probs.dtype)],
            axis=0)

    def shard_fn(tp):
        # tp: [nL * n_cols, t, t, C] — this shard's tile rows
        return local_stitch_with_halo(tp, nL, n_cols, tile_size, stride,
                                      axis_name, n_dev, n_rows)

    if spill_rows:
        outs = shard_map(
            shard_fn, mesh=mesh,
            in_specs=P(axis_name),
            out_specs=(P(axis_name), P(axis_name), P(axis_name)),
        )(tile_probs)
    else:
        # k == 1: no overlap, no halo — pure banded accumulate
        outs = shard_map(shard_fn, mesh=mesh, in_specs=P(axis_name),
                         out_specs=(P(axis_name),))(tile_probs)
    return assemble_canvas(outs, spill_rows, n_rows, stride, tile_size)


def local_stitch_with_halo(tp, nL: int, n_cols: int, tile_size: int,
                           stride: int, axis_name: str, n_dev: int,
                           n_rows: int):
    """Per-shard body (call INSIDE shard_map): overlap-add this shard's
    ``nL`` tile rows, zero-weighting grid-padding rows (row index >=
    n_rows), ship the (k-1)-block-row spill to the right neighbour over
    ICI, fold the received halo into the band head.

    Returns (band,) when k == 1, else (band, spill_a, spill_c) — the
    final shard's spill is the global canvas tail (see
    :func:`assemble_canvas`).  Shared by the probs-input sharded stitch
    above and the fully-banded inference program
    (pylc_tpu/parallel/banded_infer.py)."""
    k = tile_size // stride
    spill_rows = k - 1
    d = jax.lax.axis_index(axis_name)
    rows = d * nL + jnp.arange(nL)
    w = jnp.repeat((rows < n_rows).astype(jnp.float32), n_cols)
    acc, cnt = accumulate_blocks(tp, nL, n_cols, tile_size, stride,
                                 tile_weights=w)
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
    band = blocks_to_canvas(keep_a / jnp.maximum(keep_c, 1e-9))
    if not spill_rows:
        return (band,)
    return band, spill_a, spill_c


def assemble_canvas(outs, spill_rows: int, n_rows: int, stride: int,
                    tile_size: int) -> jnp.ndarray:
    """Assemble shard_map outputs of :func:`local_stitch_with_halo`
    into the [H, W, C] canvas (still row-sharded over the mesh)."""
    if spill_rows:
        bands, spills_a, spills_c = outs
        # bands is the globally-sharded [n_rows_p*s, W, C] body; the
        # tail (k-1 block rows) comes from the LAST shard's spill —
        # with row padding the true tail lives inside the padded body,
        # so slice the full assembly down to the real canvas height
        tail = blocks_to_canvas(
            spills_a[-spill_rows:] /
            jnp.maximum(spills_c[-spill_rows:], 1e-9))
        full = jnp.concatenate([bands, tail], axis=0)
    else:
        (full,) = outs
    H = ((n_rows - 1) * stride + tile_size)
    return full[:H]


def shard_tiles_by_row(mesh: Mesh, tile_probs, axis_name: str = "data"):
    """Place a [N, t, t, C] row-major tile array with tile ROWS sharded
    over the mesh (leading-dim sharding is row sharding because the
    grid order is row-major).  Pads the row count up to a mesh multiple
    host-side when needed — the padded rows are re-padded (as zero
    weight) inside stitch_probs_sharded, so pass the ORIGINAL array;
    this helper only handles placement of evenly-dividing grids."""
    return jax.device_put(
        tile_probs, NamedSharding(mesh, P(axis_name, None, None, None)))
