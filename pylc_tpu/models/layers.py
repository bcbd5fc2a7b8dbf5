"""Shared layers: normalizers, activations, torch-parity resize.

All modules are NHWC (TPU-native layout; XLA tiles the channel dim onto
the 128-lane axis).  Parameters are kept in float32; compute dtype is
configurable (bfloat16 by default on TPU) — flax promotes per-module.

Normalizer registry replaces the reference's dict of torch classes
(models/model.py:71-76).  The reference's 500-line thread-pipe
``SynchronizedBatchNorm`` (models/sync_batchnorm/) collapses to
``axis_name='data'`` on flax BatchNorm: batch statistics are reduced
with ``lax.pmean`` across the mesh's data axis inside the jitted
program.  Under GSPMD jit with a batch-sharded input, even the plain
BatchNorm's stats are global (XLA inserts the all-reduce), so 'batch'
and 'syncbatch' coincide on a mesh — 'syncbatch' makes the cross-replica
reduction explicit for shard_map/pmap contexts.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


# --------------------------------------------------------------------- #
# activations (reference models/model.py:63-68)
# --------------------------------------------------------------------- #

ACTIVATIONS = {
    "relu": nn.relu,
    "lrelu": partial(nn.leaky_relu, negative_slope=0.01),
    "selu": nn.selu,
    "gelu": nn.gelu,
}


def get_activation(name: str) -> Callable:
    if name not in ACTIVATIONS:
        raise ValueError(f"Unknown activation '{name}'. "
                         f"Options: {sorted(ACTIVATIONS)}")
    return ACTIVATIONS[name]


# --------------------------------------------------------------------- #
# normalizers
# --------------------------------------------------------------------- #

def make_norm(norm_type: str, train: bool, dtype=None,
              axis_name: Optional[str] = None) -> Callable[..., nn.Module]:
    """Factory returning a normalizer constructor.

    torch-parity constants: BatchNorm eps=1e-5, running-stat momentum
    0.1 (flax momentum = 1 - 0.1 = 0.9).
    """
    if norm_type in ("batch", "syncbatch"):
        name = axis_name if norm_type == "syncbatch" else None
        return partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=dtype,
                       axis_name=name)
    if norm_type == "instance":
        # InstanceNorm = GroupNorm with one group per channel (flax
        # requires num_groups=None to be explicit alongside group_size)
        return partial(nn.GroupNorm, num_groups=None, group_size=1,
                       epsilon=1e-5, dtype=dtype)
    if norm_type == "layer":
        return partial(nn.LayerNorm, epsilon=1e-5, dtype=dtype)
    raise ValueError(f"Unknown normalizer '{norm_type}'.")


# --------------------------------------------------------------------- #
# torch-parity bilinear resize (align_corners=True)
# --------------------------------------------------------------------- #

def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int
                                  ) -> jnp.ndarray:
    """Bilinear resize matching torch ``F.interpolate(align_corners=True)``.

    jax.image.resize uses half-pixel centers, which differs from torch's
    align_corners=True sampling used throughout the reference (DeepLab
    final upsample deeplab.py:38, decoder.py:46, ASPP pool branch
    aspp.py:79, UNet upsample unet.py:136).  Published checkpoints were
    trained against align_corners=True, so we reproduce it: source
    coordinate = i * (in - 1) / (out - 1).

    x: [..., H, W, C] (resizes the -3 and -2 axes).

    Implementation: per-axis interpolation as a dense matmul against a
    static two-nonzeros-per-row [n_out, n_in] matrix.  A gather-based
    lerp (``jnp.take`` on computed indices) costs ~9 ms/step in the
    DeepLab train program on v5e (gather forward + scatter-add
    backward, see docs/ASPP_PROFILE.md trace); the matmul form runs on
    the MXU and its transpose (backward) is just the transposed matmul.
    """
    h, w = x.shape[-3], x.shape[-2]
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mh = jnp.asarray(_interp_matrix(h, out_h))      # [out_h, h]
    mw = jnp.asarray(_interp_matrix(w, out_w))      # [out_w, w]
    x = jnp.einsum("...hwc,Hh->...Hwc", x, mh)
    x = jnp.einsum("...hwc,Ww->...hWc", x, mw)
    return x.astype(dtype)


@functools.lru_cache(maxsize=64)
def _interp_matrix(n_in: int, n_out: int):
    """Static align-corners interpolation matrix [n_out, n_in]
    (source coordinate = i * (n_in - 1) / (n_out - 1))."""
    import numpy as np
    m = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        m[:, 0] = 1.0
        return m
    c = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.floor(c).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    t = (c - lo).astype(np.float32)
    rows = np.arange(n_out)
    np.add.at(m, (rows, lo), 1.0 - t)
    np.add.at(m, (rows, hi), t)
    return m


def center_crop(x: jnp.ndarray, target_h: int, target_w: int) -> jnp.ndarray:
    """Center-crop the spatial dims of [..., H, W, C]
    (reference unet.py:142-148)."""
    h, w = x.shape[-3], x.shape[-2]
    dy = (h - target_h) // 2
    dx = (w - target_w) // 2
    return x[..., dy:dy + target_h, dx:dx + target_w, :]


# --------------------------------------------------------------------- #
# conv helpers
# --------------------------------------------------------------------- #

def conv3x3(features: int, stride: int = 1, dilation: int = 1,
            padding="SAME", use_bias: bool = False, dtype=None,
            name: Optional[str] = None) -> nn.Conv:
    pad = padding
    if padding == "SAME" and dilation > 1:
        pad = [(dilation, dilation), (dilation, dilation)]
    return nn.Conv(features, (3, 3), strides=(stride, stride),
                   padding=pad, kernel_dilation=(dilation, dilation),
                   use_bias=use_bias, dtype=dtype, name=name)


def conv1x1(features: int, stride: int = 1, use_bias: bool = False,
            dtype=None, name: Optional[str] = None) -> nn.Conv:
    return nn.Conv(features, (1, 1), strides=(stride, stride),
                   padding="VALID", use_bias=use_bias, dtype=dtype,
                   name=name)


def max_pool_3x3_s2_p1(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(kernel=3, stride=2, padding=1) parity."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
