"""Spatially-sharded stitch (canvas sharded over the mesh, ppermute
halo exchange) must equal the single-device stitch exactly.

SURVEY §5.7(b): the canvas-sharding option of the spatial scale-out
story — complements tests/test_sharded_infer.py (tile-batch sharding).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pylc_tpu.ops.tiles import stitch_probs, unfold_tiles
from pylc_tpu.parallel.mesh import get_mesh
from pylc_tpu.parallel.sharded_stitch import (
    can_shard, shard_tiles_by_row, stitch_probs_sharded)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return get_mesh(8)


@pytest.mark.parametrize("n_rows,n_cols,tile,stride", [
    (8, 5, 32, 16),    # k=2, one spill row per boundary
    (32, 3, 32, 8),    # k=4, three spill rows per boundary
    (8, 4, 32, 32),    # k=1, no overlap, no halo
    (9, 5, 32, 16),    # uneven: 9 rows over 8 devices (zero-weight pad)
    (13, 3, 32, 16),   # uneven, bigger remainder
    (6, 4, 32, 32),    # uneven, k=1
    (30, 3, 32, 8),    # k=4, 0 < pad(=2) < k-1(=3): real canvas tail
                       # straddles the padded body and the last spill
])
def test_sharded_stitch_matches_single_device(mesh8, rng, n_rows, n_cols,
                                              tile, stride):
    C = 9
    probs = rng.random((n_rows * n_cols, tile, tile, C)).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)

    ref = np.asarray(stitch_probs(jnp.asarray(probs), n_rows, n_cols,
                                  tile, stride))
    assert can_shard(n_rows, tile, stride, 8)
    placed = shard_tiles_by_row(mesh8, probs) if n_rows % 8 == 0 \
        else jnp.asarray(probs)
    sharded = stitch_probs_sharded(placed, n_rows, n_cols, tile, stride,
                                   mesh8)
    np.testing.assert_allclose(np.asarray(sharded), ref, rtol=1e-6,
                               atol=1e-7)


def test_sharded_stitch_roundtrip_constant_canvas(mesh8):
    """unfold -> sharded stitch must reproduce a constant prob canvas
    exactly (count normalization correctness at every halo seam)."""
    H, W, C = 8 * 16 + 16, 96, 4   # n_rows = (144-32)/16+1 = 8
    canvas = jnp.full((H, W, C), 0.25, jnp.float32)
    tiles = unfold_tiles(canvas, 32, 16)
    out = stitch_probs_sharded(shard_tiles_by_row(get_mesh(8), tiles),
                               8, (W - 32) // 16 + 1, 32, 16, get_mesh(8))
    np.testing.assert_allclose(np.asarray(out), 0.25, atol=1e-7)


def test_can_shard_guard():
    assert can_shard(8, 32, 16, 8)
    assert can_shard(9, 32, 16, 8)          # uneven: zero-weight pad
    assert not can_shard(8, 32, 4, 8)       # k-1 = 7 > 1 local row


@pytest.mark.parametrize("n_dev", [2, 4])
@pytest.mark.parametrize("n_rows,tile,stride", [
    (7, 32, 16),    # uneven over both mesh sizes, k=2
    (10, 32, 8),    # k=4, multi-row spill
])
def test_sharded_stitch_other_mesh_sizes(rng, n_dev, n_rows, tile,
                                         stride):
    """Mesh sizes below the full 8: band/pad arithmetic must not bake
    in n_dev=8 assumptions (the CRF sibling had a pad-spanning bug of
    exactly this class)."""
    if len(jax.devices()) < n_dev:
        pytest.skip(f"needs {n_dev} devices")
    n_cols, C = 3, 5
    mesh = get_mesh(n_dev)
    probs = rng.random((n_rows * n_cols, tile, tile, C)).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    ref = np.asarray(stitch_probs(jnp.asarray(probs), n_rows, n_cols,
                                  tile, stride))
    assert can_shard(n_rows, tile, stride, n_dev)
    out = stitch_probs_sharded(jnp.asarray(probs), n_rows, n_cols,
                               tile, stride, mesh)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6,
                               atol=1e-7)
