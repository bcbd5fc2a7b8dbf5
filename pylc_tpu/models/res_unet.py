"""Residual U-Net (valid-conv geometry shared with UNet).

Capability parity with reference models/architectures/res_unet.py:18-169.
Fixes vs. reference (docs/DEVIATIONS.md): the reference residual add is
channel-incompatible whenever in != out channels (its ``shortcut`` is
Identity) and its forward contains a stray debug print (res_unet.py:137);
here the shortcut is a 1x1 conv projection when shapes differ, cropped to
the valid-conv output window.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn

from pylc_tpu.models.layers import center_crop, resize_bilinear_align_corners


class UNetResBlock(nn.Module):
    features: int
    act: Callable
    norm: Callable[..., nn.Module] = None  # phase-bound factory
    padding: str = "VALID"
    dtype: Any = None

    def _norm(self, y, train):
        # cfg.norm_type flows in as a phase-bound factory (make_norm);
        # the BatchNorm fallback keeps standalone use working
        if self.norm is not None:
            return self.norm()(y)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5)(y)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), padding=self.padding,
                    dtype=self.dtype)(x)
        y = self._norm(y, train)
        y = self.act(y)
        y = nn.Conv(self.features, (3, 3), padding=self.padding,
                    dtype=self.dtype)(y)
        y = self._norm(y, train)
        if residual.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1), use_bias=False,
                               dtype=self.dtype,
                               name="shortcut_proj")(residual)
        residual = center_crop(residual, y.shape[-3], y.shape[-2])
        return self.act(y + residual.astype(y.dtype))


class ResUNetUpBlock(nn.Module):
    features: int
    up_mode: str
    act: Callable
    norm: Callable[..., nn.Module] = None
    padding: str = "VALID"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, bridge, *, train: bool = False):
        if self.up_mode == "upconv":
            x = nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                                 dtype=self.dtype)(x)
        else:
            x = resize_bilinear_align_corners(
                x, x.shape[-3] * 2, x.shape[-2] * 2)
            x = nn.Conv(self.features, (1, 1), dtype=self.dtype)(x)
        bridge = center_crop(bridge, x.shape[-3], x.shape[-2])
        x = jnp.concatenate([x, bridge.astype(x.dtype)], axis=-1)
        return UNetResBlock(self.features, self.act, self.norm,
                            self.padding, self.dtype)(x, train=train)


class ResUNet(nn.Module):
    n_classes: int = 9
    depth: int = 5
    wf: int = 6
    up_mode: str = "upsample"
    act: Callable = nn.relu
    norm: Callable[..., nn.Module] = None
    padding: str = "VALID"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        blocks = []
        for i in range(self.depth):
            x = UNetResBlock(2 ** (self.wf + i), self.act, self.norm,
                             self.padding, self.dtype,
                             name=f"enc{i}")(x, train=train)
            if i != self.depth - 1:
                blocks.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for i, j in enumerate(reversed(range(self.depth - 1))):
            x = ResUNetUpBlock(2 ** (self.wf + j), self.up_mode, self.act,
                               self.norm, self.padding, self.dtype,
                               name=f"dec{i}")(x, blocks[-i - 1], train=train)
        x = nn.Conv(self.n_classes, (1, 1), name="head")(x)
        return x.astype(jnp.float32)
