"""MobileNetV2 backbone for DeepLabV3+ (NHWC, Flax).

Capability parity with reference models/backbone/mobilenet.py:32-158
(vestigial there: models/architectures/deeplab.py:23-26 never wires it,
so the reference cannot actually construct this model — here it is a
working first-class backbone).  Inverted-residual blocks (expand 1x1 ->
depthwise 3x3 -> linear 1x1) with ReLU6, width_mult 1.0, the standard
(t, c, n, s) table, and the reference's output-stride dilation plan:
once the running stride reaches ``output_stride`` further stages keep
stride 1 and dilate the depthwise convs by the accumulated rate.

Returns (x [B, H/os, W/os, 320], low_level_feat [B, H/4, W/4, 24]) —
the channel plan the reference ASPP/decoder keep branches for
(models/modules/aspp.py:47, models/decoder.py:22).

Padding semantics are reference-faithful: the *block input* is
zero-padded before the expand conv (``fixed_padding``, reference
mobilenet.py:23-29) and the depthwise conv runs VALID — so eval logits
match a torch reference block bit-for-bit (boundary pixels see
BN(0)-transformed pad values, not zeros) and torch checkpoints convert
exactly (`convert.convert_mobilenet_backbone`, golden-tested).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# (expand_ratio t, out_channels c, repeats n, stride s) — the MobileNetV2
# paper table, reference mobilenet.py:84-92
_SETTINGS: Sequence[Tuple[int, int, int, int]] = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class InvertedResidual(nn.Module):
    out_ch: int
    stride: int = 1
    dilation: int = 1
    expand: int = 6
    norm: Callable[..., nn.Module] = nn.BatchNorm
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        inp = x.shape[-1]
        hidden = round(inp * self.expand)
        d = self.dilation
        # reference fixed_padding (mobilenet.py:23-29,70): the WHOLE
        # block input is padded, so the expand conv/BN also see the pad
        # ring and the depthwise conv runs VALID — required for exact
        # torch-checkpoint parity (boundary pixels differ otherwise)
        pad = 2 * d  # (k-1) + (k-1)(d-1) for k=3
        pb, pe = pad // 2, pad - pad // 2
        y = jnp.pad(x, ((0, 0), (pb, pe), (pb, pe), (0, 0)))
        if self.expand != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(y)
            y = self.norm(name="expand_bn")(y)
            y = jax.nn.relu6(y)
        y = nn.Conv(hidden, (3, 3), strides=(self.stride, self.stride),
                    padding="VALID", kernel_dilation=(d, d),
                    feature_group_count=hidden,
                    use_bias=False, dtype=self.dtype, name="dw_conv")(y)
        y = self.norm(name="dw_bn")(y)
        y = jax.nn.relu6(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(y)
        y = self.norm(name="project_bn")(y)
        if self.stride == 1 and inp == self.out_ch:
            y = y + x.astype(y.dtype)
        return y


class MobileNetV2(nn.Module):
    """Returns (x [B, H/os, W/os, 320], low_level [B, H/4, W/4, 24])."""

    output_stride: int = 16
    norm: Callable[..., nn.Module] = nn.BatchNorm
    dtype: Any = None
    remat: bool = False

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.output_stride not in (8, 16):
            raise NotImplementedError(
                f"output_stride {self.output_stride}")
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = self.norm(name="stem_bn")(x)
        x = jax.nn.relu6(x)

        Block = nn.remat(InvertedResidual) if self.remat else InvertedResidual

        low_level = None
        stride_now, rate = 2, 1
        feat_i = 1  # stem was features[0]
        for t, c, n, s in _SETTINGS:
            if stride_now == self.output_stride:
                stride, dilation = 1, rate
                rate *= s
            else:
                stride, dilation = s, 1
                stride_now *= s
            for i in range(n):
                x = Block(c, stride if i == 0 else 1, dilation, t,
                          self.norm, self.dtype,
                          name=f"block{feat_i}")(x)
                feat_i += 1
                if feat_i == 4:  # features[0:4] = stem + 3 blocks
                    low_level = x  # 24 ch @ OS4 (reference :122-124)
        return x, low_level
