"""Native C++ host library vs the device/jnp implementations."""

import numpy as np
import pytest

from pylc_tpu import native
from pylc_tpu.config import Schema, DEFAULT_SCHEMA


@pytest.fixture(scope="module")
def palette():
    return np.asarray(Schema.load(DEFAULT_SCHEMA).palette_rgb, np.uint8)


def test_native_builds():
    assert native.available(), "g++ build of native/pylc_host.cpp failed"


def test_native_class_encode_matches_device(rng, palette):
    from pylc_tpu.ops.palette import class_encode as device_encode
    rgb = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    rgb[:16, :16] = palette[4]
    got = native.class_encode(rgb, palette)
    want = np.asarray(device_encode(rgb, palette))
    np.testing.assert_array_equal(got, want)


def test_native_class_encode_lut_path(rng, palette):
    """> 1 Mpx triggers the 16 MiB direct-LUT code path."""
    classes = rng.integers(0, len(palette), (1200, 1200)).astype(np.uint8)
    rgb = palette[classes]
    got = native.class_encode(rgb, palette)
    np.testing.assert_array_equal(got, classes)


def test_native_colourize_roundtrip(rng, palette):
    cm = rng.integers(0, len(palette), (48, 32)).astype(np.uint8)
    rgb = native.colourize(cm, palette)
    np.testing.assert_array_equal(rgb, palette[cm])


def test_native_unfold_matches_device(rng):
    from pylc_tpu.ops.tiles import unfold_tiles as device_unfold
    img = rng.integers(0, 256, (96, 128, 3)).astype(np.uint8)
    got = native.unfold_tiles(img, 32, 16)  # [N, C, t, t]
    want = np.transpose(np.asarray(device_unfold(img, 32, 16)),
                        (0, 3, 1, 2))
    np.testing.assert_array_equal(got, want)


def test_native_coshuffle_pairs_stay_aligned(rng):
    imgs = rng.integers(0, 256, (50, 3, 8, 8)).astype(np.uint8)
    masks = imgs[:, 0, :, :].copy()  # mask derived from img for checking
    si, sm = native.coshuffle(imgs.copy(), masks.copy(), seed=7)
    # pairs must remain aligned after the shuffle
    np.testing.assert_array_equal(si[:, 0, :, :], sm)
    # and it actually shuffled
    assert not np.array_equal(si, imgs)
