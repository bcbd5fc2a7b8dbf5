"""Palette (class <-> colour) codecs as device-side JAX ops.

TPU-native replacement for the reference's per-class boolean loops
(reference: utils/tools.py:322-449).  Both directions are expressed as
vectorized LUT ops that XLA fuses into surrounding computation:

  - ``class_encode``: RGB mask -> class indices.  Instead of C boolean
    passes over the full image, we pack each RGB triple into a single
    int32 (r<<16 | g<<8 | b) and compare against the packed palette in
    one [P, C]-broadcast — one VPU pass.
  - ``colourize``: class-index map -> RGB via a single gather from the
    palette LUT (reference colourize loops over classes in Python).

Behavioral note (documented deviation): unmatched pixels default to
class 1, reproducing the reference's ``np.ones`` initialization
(utils/tools.py:437).  This quirk is semantically load-bearing — masks
with stray anti-aliased colours silently map to class 1 there — so we
preserve it for golden parity; pass ``default_class`` to override.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _pack_rgb(rgb):
    """Pack [..., 3] uint8 RGB into [...] int32 keys."""
    rgb = rgb.astype(jnp.int32)
    return (rgb[..., 0] << 16) | (rgb[..., 1] << 8) | rgb[..., 2]


def palette_lut(palette_rgb) -> jnp.ndarray:
    """Palette as [C, 3] uint8 device array."""
    return jnp.asarray(np.asarray(palette_rgb, dtype=np.uint8))


@jax.jit
def _encode_kernel(rgb, palette, default_class):
    keys = _pack_rgb(rgb)  # [...]
    pal_keys = _pack_rgb(palette)  # [C]
    # [..., C] equality; argmax returns first match
    eq = keys[..., None] == pal_keys
    idx = jnp.argmax(eq, axis=-1)
    matched = jnp.any(eq, axis=-1)
    return jnp.where(matched, idx, default_class).astype(jnp.uint8)


def class_encode(rgb_mask, palette_rgb, default_class: int = 1):
    """Convert an RGB mask to class-index encoding.

    Parameters
    ----------
    rgb_mask: array[..., 3] uint8 — RGB mask (any leading shape; the
        reference's NCHW input corresponds to [N, H, W, 3] here).
    palette_rgb: [C, 3] palette.
    default_class: class index for unmatched pixels (reference quirk = 1).

    Returns array[...] uint8 of class indices.
    """
    palette = palette_lut(palette_rgb)
    return _encode_kernel(jnp.asarray(rgb_mask), palette,
                          jnp.uint8(default_class))


@jax.jit
def _colourize_kernel(class_map, palette):
    return jnp.take(palette, class_map.astype(jnp.int32), axis=0)


def colourize(class_map, palette_rgb):
    """Class-index map -> RGB image via palette LUT gather.

    Equivalent to reference utils/tools.py:322-358 but a single device
    gather instead of a Python loop over classes.
    """
    return _colourize_kernel(jnp.asarray(class_map),
                             palette_lut(palette_rgb))


def map_palette(class_map, key):
    """Remap class indices by a key array (e.g. schema_b -> schema_a via
    the 'b-to-a' map).  Reference: utils/tools.py:388-409."""
    key = jnp.asarray(np.asarray(key))
    return jnp.take(key, jnp.asarray(class_map).astype(jnp.int32), axis=0)
