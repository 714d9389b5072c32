"""ResNet-31 feature backbone (FAN-style), TPU-native NHWC.

Capability parity with reference modules/feature_extraction.py:1-150:
stage widths [128, 256, 512, 512], block counts [1, 2, 5, 3], and the
asymmetric width-preserving reductions — maxpool3 stride (2,1) pad (0,1)
(reference:78) and conv4_1 stride (2,1) pad (0,1) (reference:85-87) — that
turn a 32x100 crop into a [B, 1, 26, 512] column sequence.

Convs run in the configured compute dtype (bfloat16 by default) — this is
where the model's FLOPs live and the MXU wants bf16; BatchNorm statistics
stay float32.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import FusedBatchNorm


def _make_bn(train: bool, dtype, fused: bool, name: str):
    """nn.BatchNorm, or the identical-forward FusedBatchNorm whose backward
    reductions run as one Pallas pass (ops/batchnorm.py)."""
    cls = FusedBatchNorm if fused else nn.BatchNorm
    return cls(use_running_average=not train, momentum=0.9, epsilon=1e-5,
               dtype=dtype, name=name)


class BasicBlock(nn.Module):
    """3x3-3x3 residual block with optional 1x1 projection
    (reference: feature_extraction.py:14-47)."""

    planes: int
    dtype: jnp.dtype = jnp.float32
    fused_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return _make_bn(train, self.dtype, self.fused_bn, name)

        residual = x
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = bn("bn2")(out)
        if x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1), use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(out + residual)


class ResNet31(nn.Module):
    """FAN ResNet: stem + 4 stages with inter-stage convs
    (reference: feature_extraction.py:50-150)."""

    output_channels: int = 512
    layers: Sequence[int] = (1, 2, 5, 3)
    dtype: jnp.dtype = jnp.float32
    fused_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = self.output_channels
        stage_ch = (oc // 4, oc // 2, oc, oc)

        def bn(name):
            return _make_bn(train, self.dtype, self.fused_bn, name)

        def conv_bn_relu(h, ch, name, kernel=(3, 3), strides=(1, 1), padding=1):
            h = nn.Conv(ch, kernel, strides=strides, padding=padding,
                        use_bias=False, dtype=self.dtype, name=f"{name}_conv")(h)
            return nn.relu(bn(f"{name}_bn")(h))

        x = x.astype(self.dtype)

        # stem (reference:58-64): 3x3 -> oc/16, 3x3 -> oc/8
        x = conv_bn_relu(x, oc // 16, "stem0")
        x = conv_bn_relu(x, oc // 8, "stem1")

        # stage 1 (reference:66-70)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for i in range(self.layers[0]):
            x = BasicBlock(stage_ch[0], dtype=self.dtype, fused_bn=self.fused_bn, name=f"block1_{i}")(x, train)
        x = conv_bn_relu(x, stage_ch[0], "trans1")

        # stage 2 (reference:72-76)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for i in range(self.layers[1]):
            x = BasicBlock(stage_ch[1], dtype=self.dtype, fused_bn=self.fused_bn, name=f"block2_{i}")(x, train)
        x = conv_bn_relu(x, stage_ch[1], "trans2")

        # stage 3 (reference:78-82): height-only pool, width padded +2
        x = nn.max_pool(x, (2, 2), strides=(2, 1), padding=((0, 0), (1, 1)))
        for i in range(self.layers[2]):
            x = BasicBlock(stage_ch[2], dtype=self.dtype, fused_bn=self.fused_bn, name=f"block3_{i}")(x, train)
        x = conv_bn_relu(x, stage_ch[2], "trans3")

        # stage 4 (reference:84-90): blocks then two 2x2 convs collapsing H
        for i in range(self.layers[3]):
            x = BasicBlock(stage_ch[3], dtype=self.dtype, fused_bn=self.fused_bn, name=f"block4_{i}")(x, train)
        x = conv_bn_relu(x, stage_ch[3], "trans4a", kernel=(2, 2),
                         strides=(2, 1), padding=((0, 0), (1, 1)))
        x = conv_bn_relu(x, stage_ch[3], "trans4b", kernel=(2, 2),
                         strides=(1, 1), padding=((0, 0), (0, 0)))
        return x  # [B, 1, W/4+1, oc] for a 32-high input


def to_column_sequence(features: jnp.ndarray) -> jnp.ndarray:
    """[B, H', W', C] -> [B, W', C] by averaging the height axis.

    Equivalent to the reference's permute + AdaptiveAvgPool2d((None, 1)) +
    squeeze (reference: model.py:92-93); H' is already 1 for 32-high crops so
    the mean is an identity in the standard geometry.
    """
    return jnp.mean(features, axis=1)
