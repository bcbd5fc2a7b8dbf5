import numpy as np

from pylc_tpu.config import Schema, DEFAULT_SCHEMA
from pylc_tpu.ops.palette import class_encode, colourize, map_palette


def ref_class_encode(rgb_nhwc, palette):
    """Faithful numpy port of reference utils/tools.py:412-449 semantics
    (unmatched pixels default to class 1)."""
    n, h, w, _ = rgb_nhwc.shape
    flat = rgb_nhwc.reshape(-1, 3)
    out = np.ones(flat.shape[0])
    for idx, c in enumerate(palette):
        match = np.all(flat == np.array(c), axis=1)
        out[match] = idx
    return out.reshape(n, h, w).astype(np.uint8)


def test_encode_decode_roundtrip(rng):
    schema = Schema.load(DEFAULT_SCHEMA)
    palette = np.array(schema.palette_rgb, dtype=np.uint8)
    classes = rng.integers(0, schema.n_classes, size=(2, 32, 32))
    rgb = palette[classes]
    enc = np.asarray(class_encode(rgb, palette))
    assert enc.dtype == np.uint8
    np.testing.assert_array_equal(enc, classes)
    dec = np.asarray(colourize(enc, palette))
    np.testing.assert_array_equal(dec, rgb)


def test_encode_matches_reference_including_default_quirk(rng):
    schema = Schema.load(DEFAULT_SCHEMA)
    palette = np.array(schema.palette_rgb, dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(1, 16, 16, 3)).astype(np.uint8)
    # plant some exact palette colours
    rgb[0, :4, :4] = palette[3]
    rgb[0, 4:6, :2] = palette[0]
    got = np.asarray(class_encode(rgb, palette))
    want = ref_class_encode(rgb, palette)
    np.testing.assert_array_equal(got, want)


def test_map_palette_b_to_a():
    key = np.array([0, 1, 1, 2, 3, 3, 4, 5, 6, 7, 8])
    cm = np.array([[0, 2, 10], [5, 4, 9]], dtype=np.uint8)
    got = np.asarray(map_palette(cm, key))
    np.testing.assert_array_equal(got, key[cm])


def test_schema_b_roundtrip(rng):
    """11-class schema_b palette codecs round-trip."""
    import os
    from pylc_tpu.config import Schema, SCHEMA_DIR
    schema = Schema.load(os.path.join(SCHEMA_DIR, "schema_b.json"))
    assert schema.n_classes == 11
    palette = np.array(schema.palette_rgb, dtype=np.uint8)
    classes = rng.integers(0, 11, size=(1, 16, 16))
    enc = np.asarray(class_encode(palette[classes], palette))
    np.testing.assert_array_equal(enc, classes)


def test_schema_b_to_a_mapping():
    """The published b-to-a class map collapses 11 -> 9 classes."""
    import json, os
    from pylc_tpu.config import SCHEMA_DIR
    with open(os.path.join(SCHEMA_DIR, "schema_a.json")) as f:
        key = json.load(f)["maps"]["b-to-a"]
    assert len(key) == 11
    assert max(key) == 8
    cm_b = np.arange(11, dtype=np.uint8).reshape(1, 11)
    got = np.asarray(map_palette(cm_b, np.asarray(key)))
    np.testing.assert_array_equal(got[0], key)
