"""DRN-D-54 (Dilated Residual Network) backbone for DeepLabV3+ (NHWC).

Capability parity with reference models/backbone/drn.py:109-241 +
drn_d_54 (:384-392) (vestigial there: models/architectures/deeplab.py
:23-26 never wires it — here it is a working first-class backbone).

Arch-D plan, layers [1, 1, 3, 4, 6, 3, 1, 1], channels
(16, 32, 64, 128, 256, 512, 512, 512):

- layer0: 7x7 s1 conv -> 16, BN, ReLU (no initial downsample)
- layer1/2: plain 3x3 conv-BN-ReLU stacks (16 s1, 32 s2)
- layer3..6: bottleneck stages (reuses the ResNet ``Bottleneck``) —
  planes 64 s2 / 128 s2 / 256 d2 / 512 d4
- layer7/8: plain 3x3 conv stacks 512 d2 / 512 d1 (de-gridding tail)

Natively output-stride 8: strides live in layer2/3/4, deeper stages
dilate instead.  Returns (x [B, H/8, W/8, 512], low_level_feat
[B, H/4, W/4, 256] taken after layer3, reference drn.py:227-229) — the
channel plan the reference ASPP/decoder keep branches for
(models/modules/aspp.py:45, models/decoder.py:18).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

from flax import linen as nn
import jax.numpy as jnp

from pylc_tpu.models.resnet import Bottleneck


class ConvStage(nn.Module):
    """n x (3x3 conv -> BN -> ReLU), reference drn.py:205-215."""

    channels: int
    n: int = 1
    stride: int = 1
    dilation: int = 1
    norm: Callable[..., nn.Module] = nn.BatchNorm
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dilation
        for i in range(self.n):
            s = self.stride if i == 0 else 1
            x = nn.Conv(self.channels, (3, 3), strides=(s, s),
                        padding=[(d, d), (d, d)], kernel_dilation=(d, d),
                        use_bias=False, dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = self.norm(name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class DRN54(nn.Module):
    """Returns (x [B, H/8, W/8, 512], low_level [B, H/4, W/4, 256])."""

    norm: Callable[..., nn.Module] = nn.BatchNorm
    dtype: Any = None
    remat: bool = False

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = nn.Conv(16, (7, 7), padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, name="layer0_conv")(x)
        x = self.norm(name="layer0_bn")(x)
        x = nn.relu(x)
        x = ConvStage(16, 1, 1, 1, self.norm, self.dtype, name="layer1")(x)
        x = ConvStage(32, 1, 2, 1, self.norm, self.dtype, name="layer2")(x)

        Block = nn.remat(Bottleneck) if self.remat else Bottleneck

        def stage(x, planes, blocks, stride, dilation, name):
            needs_ds = stride != 1 or x.shape[-1] != planes * 4
            x = Block(planes, stride, dilation, needs_ds, self.norm,
                      self.dtype, name=f"{name}_0")(x)
            for i in range(1, blocks):
                x = Block(planes, 1, dilation, False, self.norm,
                          self.dtype, name=f"{name}_{i}")(x)
            return x

        x = stage(x, 64, 3, 2, 1, "layer3")
        low_level_feat = x                      # 256 ch @ OS4
        x = stage(x, 128, 4, 2, 1, "layer4")    # 512 @ OS8
        x = stage(x, 256, 6, 1, 2, "layer5")    # 1024, dilated
        x = stage(x, 512, 3, 1, 4, "layer6")    # 2048, dilated
        x = ConvStage(512, 1, 1, 2, self.norm, self.dtype, name="layer7")(x)
        x = ConvStage(512, 1, 1, 1, self.norm, self.dtype, name="layer8")(x)
        return x, low_level_feat
