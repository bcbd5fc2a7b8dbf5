"""Modified Aligned Xception backbone for DeepLabV3+ (NHWC, Flax).

Capability parity with reference models/backbone/xception.py:16-284:
entry flow (conv 3x3/2 -> 64 -> blocks 128/256/728), 16 middle-flow
blocks at 728 channels, exit flow (block to 1024 + three separable convs
to 1536/1536/2048), output_stride 16 or 8 via the entry-block-3 stride
and exit dilations, low-level features after block1 (+relu).

Separable conv = depthwise (feature_group_count = C_in) + BN + pointwise
1x1, with "fixed" (TF-style SAME-for-dilation) padding
(xception.py:16-39).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax.numpy as jnp
from flax import linen as nn


def _fixed_pad(k: int, dilation: int):
    eff = k + (k - 1) * (dilation - 1)
    total = eff - 1
    beg = total // 2
    return (beg, total - beg)


class SeparableConv(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    norm: Callable[..., nn.Module] = nn.BatchNorm
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        pad = _fixed_pad(3, self.dilation)
        x = nn.Conv(cin, (3, 3), strides=(self.stride, self.stride),
                    padding=[pad, pad],
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=cin, use_bias=False,
                    dtype=self.dtype, name="depthwise")(x)
        x = self.norm(name="bn")(x)
        return nn.Conv(self.features, (1, 1), use_bias=False,
                       dtype=self.dtype, name="pointwise")(x)


class XBlock(nn.Module):
    features: int
    reps: int
    stride: int = 1
    dilation: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    is_last: bool = False
    norm: Callable[..., nn.Module] = nn.BatchNorm
    dtype: Any = None

    @nn.compact
    def __call__(self, inp):
        x = inp
        idx = 0
        first = True

        def relu_maybe(x, first):
            # reference drops the first relu when start_with_relu=False
            if first and not self.start_with_relu:
                return x
            return nn.relu(x)

        if self.grow_first:
            x = relu_maybe(x, first); first = False
            x = SeparableConv(self.features, 1, self.dilation, self.norm,
                              self.dtype, name=f"sep{idx}")(x)
            x = self.norm(name=f"sepbn{idx}")(x); idx += 1
        for _ in range(self.reps - 1):
            x = relu_maybe(x, first); first = False
            x = SeparableConv(x.shape[-1], 1, self.dilation, self.norm,
                              self.dtype, name=f"sep{idx}")(x)
            x = self.norm(name=f"sepbn{idx}")(x); idx += 1
        if not self.grow_first:
            x = relu_maybe(x, first); first = False
            x = SeparableConv(self.features, 1, self.dilation, self.norm,
                              self.dtype, name=f"sep{idx}")(x)
            x = self.norm(name=f"sepbn{idx}")(x); idx += 1
        if self.stride != 1:
            x = nn.relu(x)
            x = SeparableConv(self.features, 2, 1, self.norm,
                              self.dtype, name=f"sep{idx}")(x)
            x = self.norm(name=f"sepbn{idx}")(x); idx += 1
        if self.stride == 1 and self.is_last:
            x = nn.relu(x)
            x = SeparableConv(self.features, 1, 1, self.norm,
                              self.dtype, name=f"sep{idx}")(x)
            x = self.norm(name=f"sepbn{idx}")(x); idx += 1

        if self.features != inp.shape[-1] or self.stride != 1:
            skip = nn.Conv(self.features, (1, 1),
                           strides=(self.stride, self.stride),
                           use_bias=False, dtype=self.dtype,
                           name="skip")(inp)
            skip = self.norm(name="skipbn")(skip)
        else:
            skip = inp
        return x + skip.astype(x.dtype)


class AlignedXception(nn.Module):
    output_stride: int = 16
    norm: Callable[..., nn.Module] = nn.BatchNorm
    dtype: Any = None
    remat: bool = False  # rematerialize block activations (training)

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        global XBlock
        Block = nn.remat(XBlock) if self.remat else XBlock
        if self.output_stride == 16:
            entry3_stride, mid_dil, exit_dil = 2, 1, (1, 2)
        elif self.output_stride == 8:
            entry3_stride, mid_dil, exit_dil = 1, 2, (2, 4)
        else:
            raise NotImplementedError

        # entry flow
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = self.norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv2")(x)
        x = self.norm(name="bn2")(x)
        x = nn.relu(x)

        x = Block(128, 2, stride=2, start_with_relu=False, norm=self.norm,
                   dtype=self.dtype, name="block1")(x)
        x = nn.relu(x)
        low_level_feat = x
        x = Block(256, 2, stride=2, start_with_relu=False, grow_first=True,
                   norm=self.norm, dtype=self.dtype, name="block2")(x)
        x = Block(728, 2, stride=entry3_stride, start_with_relu=True,
                   grow_first=True, is_last=True, norm=self.norm,
                   dtype=self.dtype, name="block3")(x)

        # middle flow: 16 blocks (reference block4..block19)
        for i in range(4, 20):
            x = Block(728, 3, stride=1, dilation=mid_dil,
                       start_with_relu=True, grow_first=True,
                       norm=self.norm, dtype=self.dtype,
                       name=f"block{i}")(x)

        # exit flow
        x = Block(1024, 2, stride=1, dilation=exit_dil[0],
                   start_with_relu=True, grow_first=False, is_last=True,
                   norm=self.norm, dtype=self.dtype, name="block20")(x)
        x = nn.relu(x)
        for i, feats in ((3, 1536), (4, 1536), (5, 2048)):
            x = SeparableConv(feats, 1, exit_dil[1], self.norm,
                              self.dtype, name=f"conv{i}")(x)
            x = self.norm(name=f"bn{i}")(x)
            x = nn.relu(x)
        return x, low_level_feat
