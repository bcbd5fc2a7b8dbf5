"""ASPP (Atrous Spatial Pyramid Pooling) head.

Capability parity with reference models/modules/aspp.py:15-103: four
parallel atrous branches (1x1 + 3x3 at dilations 6/12/18 for OS16,
12/24/36 for OS8), an image-level pooling branch broadcast back to the
feature map, channel concat (5*256 = 1280) and a 1x1 projection to 256
with BN + ReLU + dropout(0.5).

TPU note: the five branches read the same [B, H/16, W/16, 2048] input —
XLA schedules them as independent fused convolutions on the MXU; the
concat+1x1 lowers into a single matmul over the stacked channel dim.
Whether a hand-fused Pallas variant can beat this is a measured
question: see docs/ASPP_PROFILE.md for the device-profile evidence.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn


class ASPPBranch(nn.Module):
    kernel: int
    dilation: int
    norm: Callable[..., nn.Module] = nn.BatchNorm
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.kernel == 1:
            x = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv")(x)
        else:
            d = self.dilation
            x = nn.Conv(256, (3, 3), padding=[(d, d), (d, d)],
                        kernel_dilation=(d, d), use_bias=False,
                        dtype=self.dtype, name="conv")(x)
        x = self.norm(name="bn")(x)
        return nn.relu(x)


class ASPP(nn.Module):
    output_stride: int = 16
    dropout: float = 0.5
    norm: Callable[..., nn.Module] = nn.BatchNorm
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dil: Sequence[int] = (1, 6, 12, 18) if self.output_stride == 16 \
            else (1, 12, 24, 36)
        b1 = ASPPBranch(1, dil[0], self.norm, self.dtype,
                        name="aspp1")(x)
        b2 = ASPPBranch(3, dil[1], self.norm, self.dtype,
                        name="aspp2")(x)
        b3 = ASPPBranch(3, dil[2], self.norm, self.dtype,
                        name="aspp3")(x)
        b4 = ASPPBranch(3, dil[3], self.norm, self.dtype,
                        name="aspp4")(x)
        # image-level pool branch: global mean -> 1x1 conv -> broadcast
        # (align_corners interp of a 1x1 map == broadcast)
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype,
                    name="gap_conv")(g)
        g = self.norm(name="gap_bn")(g)
        g = nn.relu(g)
        g = jnp.broadcast_to(g, b4.shape)

        y = jnp.concatenate([b1, b2, b3, b4, g], axis=-1)
        y = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype,
                    name="proj")(y)
        y = self.norm(name="proj_bn")(y)
        y = nn.relu(y)
        return nn.Dropout(self.dropout, deterministic=not train)(y)
