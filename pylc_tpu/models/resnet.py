"""Dilated ResNet-101 backbone for DeepLabV3+ (NHWC, Flax).

Capability parity with reference models/backbone/resnet.py:16-177:
bottleneck blocks, output_stride 16 (strides [1,2,2,1], dilations
[1,1,1,2]) or 8, layer4 as a multi-grid [1,2,4] dilated unit, low-level
features taken after layer1.  Layer/parameter naming is chosen so the
torch->jax checkpoint converter (pylc_tpu/convert.py) can map the
published ``resnet101-5d3b4d8f.pth`` and pylc ``.pth`` model weights
key-for-key.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from pylc_tpu.models.layers import max_pool_3x3_s2_p1


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    norm: Callable[..., nn.Module] = nn.BatchNorm
    dtype: Any = None  # conv compute dtype (bf16 on TPU); params stay f32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=[(self.dilation, self.dilation)] * 2,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = self.norm(name="bn3")(y)
        if self.downsample:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual.astype(y.dtype))


class ResNet101(nn.Module):
    """Returns (x [B, H/os, W/os, 2048], low_level_feat [B, H/4, W/4, 256])."""

    output_stride: int = 16
    norm: Callable[..., nn.Module] = nn.BatchNorm
    layers: Sequence[int] = (3, 4, 23, 3)
    multi_grid: Sequence[int] = (1, 2, 4)
    dtype: Any = None
    remat: bool = False  # rematerialize bottleneck activations (training)

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.output_stride == 16:
            strides, dilations = (1, 2, 2, 1), (1, 1, 1, 2)
        elif self.output_stride == 8:
            strides, dilations = (1, 2, 1, 1), (1, 1, 2, 4)
        else:
            raise NotImplementedError(
                f"output_stride {self.output_stride}")

        # plain 7x7/s2 stem: a space-to-depth rewrite (MLPerf trick) was
        # measured 2.8x SLOWER on v5e/XLA — the 6-D relayout costs more
        # than the 3-channel conv (docs/PERF_ROUND3.md, negative result)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = self.norm(name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2_p1(x)

        Block = nn.remat(Bottleneck) if self.remat else Bottleneck

        def layer(x, planes, blocks, stride, dilation, name,
                  grid=None):
            inplanes = x.shape[-1]
            needs_ds = stride != 1 or inplanes != planes * 4
            if grid is None:
                x = Block(planes, stride, dilation, needs_ds, self.norm,
                               self.dtype, name=f"{name}_0")(x)
                for i in range(1, blocks):
                    x = Block(planes, 1, dilation, False, self.norm,
                                   self.dtype, name=f"{name}_{i}")(x)
            else:  # multi-grid unit (reference resnet.py:105-122)
                x = Block(planes, stride, grid[0] * dilation, needs_ds,
                               self.norm, self.dtype, name=f"{name}_0")(x)
                for i in range(1, len(grid)):
                    x = Block(planes, 1, grid[i] * dilation, False,
                                   self.norm, self.dtype,
                                   name=f"{name}_{i}")(x)
            return x

        x = layer(x, 64, self.layers[0], strides[0], dilations[0], "layer1")
        low_level_feat = x
        x = layer(x, 128, self.layers[1], strides[1], dilations[1], "layer2")
        x = layer(x, 256, self.layers[2], strides[2], dilations[2], "layer3")
        x = layer(x, 512, None, strides[3], dilations[3], "layer4",
                  grid=self.multi_grid)
        return x, low_level_feat
