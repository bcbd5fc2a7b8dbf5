"""DeepLabV3+ (backbone -> ASPP -> decoder -> x4 bilinear to input size).

Capability parity with reference models/architectures/deeplab.py:17-79 and
models/decoder.py:15-65: low-level 256(resnet)/128(xception) -> 48 via 1x1,
ASPP output upsampled x4 (align_corners), concat (304 ch), two 3x3 convs
with dropout 0.5/0.1, 1x1 head, final bilinear to the input resolution.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn

from pylc_tpu.models.aspp import ASPP
from pylc_tpu.models.drn import DRN54
from pylc_tpu.models.layers import resize_bilinear_align_corners
from pylc_tpu.models.mobilenet import MobileNetV2
from pylc_tpu.models.resnet import ResNet101
from pylc_tpu.models.xception import AlignedXception


class DeepLabDecoder(nn.Module):
    n_classes: int
    norm: Callable[..., nn.Module] = nn.BatchNorm
    dtype: Any = None

    @nn.compact
    def __call__(self, x, low_level_feat, *, train: bool = False):
        ll = nn.Conv(48, (1, 1), use_bias=False, dtype=self.dtype,
                     name="ll_conv")(low_level_feat)
        ll = self.norm(name="ll_bn")(ll)
        ll = nn.relu(ll)
        x = resize_bilinear_align_corners(x, ll.shape[-3], ll.shape[-2])
        x = jnp.concatenate([x, ll], axis=-1)
        x = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = self.norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv2")(x)
        x = self.norm(name="bn2")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        # plain 9-channel 1x1 head: measured best on v5e — both a
        # 128-lane-padded MXU variant and a dot_general form lose to
        # XLA's native schedule (docs/PERF_ROUND3.md, negative result)
        return nn.Conv(self.n_classes, (1, 1), name="head")(x)


class DeepLab(nn.Module):
    n_classes: int = 9
    backbone: str = "resnet"
    output_stride: int = 16
    norm: Callable[..., nn.Module] = nn.BatchNorm
    dtype: Any = None
    remat: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        """x: [B, H, W, 3] normalized input (grayscale inputs are stacked
        to 3 channels by the caller, reference models/model.py:310-311).
        Returns [B, H, W, n_classes] logits."""
        H, W = x.shape[-3], x.shape[-2]
        os = self.output_stride
        if self.backbone == "resnet":
            feat, ll = ResNet101(os, self.norm, dtype=self.dtype,
                                 remat=self.remat, name="backbone")(x)
        elif self.backbone == "xception":
            feat, ll = AlignedXception(os, self.norm, dtype=self.dtype,
                                       remat=self.remat, name="backbone")(x)
        elif self.backbone == "mobilenet":
            feat, ll = MobileNetV2(os, self.norm, dtype=self.dtype,
                                   remat=self.remat, name="backbone")(x)
        elif self.backbone == "drn":
            # DRN is natively OS8 (upstream deeplab forces this too)
            os = 8
            feat, ll = DRN54(self.norm, dtype=self.dtype,
                             remat=self.remat, name="backbone")(x)
        else:
            raise ValueError(f"Unknown backbone '{self.backbone}'")
        y = ASPP(os, norm=self.norm, dtype=self.dtype,
                 name="aspp")(feat, train=train)
        y = DeepLabDecoder(self.n_classes, self.norm, dtype=self.dtype,
                           name="decoder")(y, ll, train=train)
        return resize_bilinear_align_corners(y, H, W).astype(jnp.float32)
