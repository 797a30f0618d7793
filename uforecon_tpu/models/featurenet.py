"""FeatureNet: 3-stage FPN image encoder with deformable-conv output heads.

TPU-native rewrite of the reference FeatureNet
(reference: code1/encoder_utils/fmt/module.py:388-466 and the DCN wrapper
fmt/dcn.py:43-80). Output stages (channels-last):
  stage1: (N, H/4, W/4, 4*base)   stage2: (N, H/2, W/2, 2*base)
  stage3: (N, H,   W,   base)
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from ..ops.deform_conv import deform_conv2d
from .layers import ConvBnRelu, upsample_nearest_2x


class DCN(nn.Module):
    """Modulated deformable conv layer: a regular conv predicts per-tap
    offsets and a sigmoid mask, then the deformable contraction is applied
    (reference dcn.py:43-80). Offset/mask conv is zero-initialized so the
    layer starts as a plain convolution with 0.5 modulation."""

    features: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kk = self.kernel * self.kernel
        om = nn.Conv(
            3 * kk,
            (self.kernel, self.kernel),
            padding="SAME",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv_offset_mask",
        )(x)
        # torchvision deform_conv2d offset layout: the first 2*KK channels
        # are INTERLEAVED (dy_0, dx_0, dy_1, dx_1, ...) pairs — the DCNv2
        # wrapper's chunk+cat (dcn.py:60-63) feeds o1||o2 into that
        # interpretation, so channel 2t is dy_t and 2t+1 is dx_t. Matching
        # it keeps checkpoint transplants bit-faithful.
        offsets = om[..., : 2 * kk].reshape(*om.shape[:-1], kk, 2)
        mask = nn.sigmoid(om[..., 2 * kk:])

        cin = x.shape[-1]
        weight = self.param(
            "weight",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (self.kernel, self.kernel, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return deform_conv2d(x, offsets, mask, weight, bias)


class _DCNBlock(nn.Module):
    """[Conv(+BN+ReLU)] -> DCN -> BN -> ReLU -> DCN -> BN -> ReLU -> DCN,
    the shared shape of out1/out2/out3 heads (module.py:407-440)."""

    mid: int
    out: int
    first_kernel: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnRelu(self.mid, kernel=self.first_kernel, dtype=self.dtype)(x, train)
        x = DCN(self.mid, dtype=self.dtype, name="dcn0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = DCN(self.mid, dtype=self.dtype, name="dcn1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         dtype=jnp.float32)(x)
        x = nn.relu(x)
        return DCN(self.out, dtype=self.dtype, name="dcn2")(x)


class FeatureNet(nn.Module):
    """3-scale FPN with deformable output heads (module.py:388-466)."""

    base_channels: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        b = self.base_channels
        conv0 = ConvBnRelu(b, 3, dtype=self.dtype)(x, train)
        conv0 = ConvBnRelu(b, 3, dtype=self.dtype)(conv0, train)

        conv1 = ConvBnRelu(b * 2, 5, stride=2, dtype=self.dtype)(conv0, train)
        conv1 = ConvBnRelu(b * 2, 3, dtype=self.dtype)(conv1, train)
        conv1 = ConvBnRelu(b * 2, 3, dtype=self.dtype)(conv1, train)

        conv2 = ConvBnRelu(b * 4, 5, stride=2, dtype=self.dtype)(conv1, train)
        conv2 = ConvBnRelu(b * 4, 3, dtype=self.dtype)(conv2, train)
        conv2 = ConvBnRelu(b * 4, 3, dtype=self.dtype)(conv2, train)

        out = {}
        intra = conv2
        out["stage1"] = _DCNBlock(b * 4, b * 4, first_kernel=1,
                                  dtype=self.dtype, name="out1")(intra, train)

        inner1 = nn.Conv(b * 4, (1, 1), use_bias=True, dtype=self.dtype,
                         name="inner1")(conv1)
        intra = upsample_nearest_2x(intra) + inner1
        out["stage2"] = _DCNBlock(b * 4, b * 2, first_kernel=3,
                                  dtype=self.dtype, name="out2")(intra, train)

        inner2 = nn.Conv(b * 4, (1, 1), use_bias=True, dtype=self.dtype,
                         name="inner2")(conv0)
        intra = upsample_nearest_2x(intra) + inner2
        out["stage3"] = _DCNBlock(b * 4, b, first_kernel=3,
                                  dtype=self.dtype, name="out3")(intra, train)
        return out
