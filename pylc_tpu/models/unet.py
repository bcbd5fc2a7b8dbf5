"""U-Net with valid (unpadded) convolutions — 512 -> 324 geometry.

Capability parity with reference models/architectures/unet.py:19-155
(depth 5, first-layer filters 2^6, two valid 3x3 convs + norm + act
(+ dropout) per block, maxpool/2 encoder, upconv-or-upsample decoder
with center-cropped skip concat, 1x1 head).  The exact valid-conv
geometry (input 512 -> output 324, target crop window [94:418],
reference config.py:228-236) is preserved because the training crop
math depends on it.

Fixes vs. reference (documented in docs/DEVIATIONS.md): the reference's
conv block calls ``normalizer.evaluate(out_size)`` which is not an
attribute of any torch norm class, so UNet construction crashes as
written (unet.py:113-117); here the normalizer is simply applied.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn

from pylc_tpu.models.layers import (
    center_crop, resize_bilinear_align_corners,
)


class UNetConvBlock(nn.Module):
    features: int
    norm: Callable[..., nn.Module]
    act: Callable
    dropout: float = 0.0
    padding: str = "VALID"
    dtype: Any = None  # conv compute dtype (bf16 on TPU); params stay f32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3), padding=self.padding,
                        use_bias=True, dtype=self.dtype)(x)
            x = self.norm()(x)
            x = self.act(x)
        if self.dropout:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class UNetUpBlock(nn.Module):
    features: int
    up_mode: str
    norm: Callable[..., nn.Module]
    act: Callable
    dropout: float = 0.0
    padding: str = "VALID"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, bridge, *, train: bool = False):
        if self.up_mode == "upconv":
            x = nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                                 dtype=self.dtype)(x)
        else:  # bilinear x2 (align_corners) + 1x1 conv, reference unet.py:135-138
            x = resize_bilinear_align_corners(
                x, x.shape[-3] * 2, x.shape[-2] * 2)
            x = nn.Conv(self.features, (1, 1), dtype=self.dtype)(x)
        bridge = center_crop(bridge, x.shape[-3], x.shape[-2])
        x = jnp.concatenate([x, bridge.astype(x.dtype)], axis=-1)
        return UNetConvBlock(self.features, self.norm, self.act,
                             self.dropout, self.padding,
                             self.dtype)(x, train=train)


class UNet(nn.Module):
    n_classes: int = 9
    depth: int = 5
    wf: int = 6  # first layer has 2**wf filters
    up_mode: str = "upsample"
    dropout: float = 0.5
    norm: Callable[..., nn.Module] = nn.BatchNorm
    act: Callable = nn.relu
    padding: str = "VALID"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        """x: [B, H, W, C_in] normalized input. Returns [B, h, w, n_classes]
        logits (h = w = 324 for 512 input with VALID padding)."""
        blocks = []
        for i in range(self.depth):
            x = UNetConvBlock(2 ** (self.wf + i), self.norm, self.act,
                              self.dropout, self.padding, self.dtype,
                              name=f"enc{i}")(x, train=train)
            if i != self.depth - 1:
                blocks.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for i, j in enumerate(reversed(range(self.depth - 1))):
            x = UNetUpBlock(2 ** (self.wf + j), self.up_mode, self.norm,
                            self.act, self.dropout, self.padding, self.dtype,
                            name=f"dec{i}")(x, blocks[-i - 1], train=train)
        x = nn.Conv(self.n_classes, (1, 1), name="head")(x)
        return x.astype(jnp.float32)
