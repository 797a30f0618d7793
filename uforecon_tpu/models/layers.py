"""Common conv / norm building blocks (flax.linen, channels-last).

TPU-first equivalents of the reference block zoo
(reference: code1/encoder_utils/fmt/module.py:26-283). Convolutions are NHWC /
NDHWC so XLA can tile them straight onto the MXU; BatchNorm carries running
statistics in the 'batch_stats' collection (the reference freezes the MVS
encoder, so eval-mode statistics are the common path).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBnRelu(nn.Module):
    """Conv2d + BatchNorm + optional ReLU (reference module.py:26-57)."""

    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch pads symmetrically ((k-1)/2 each side, module.py:43);
        # flax "SAME" pads (lo, hi) asymmetrically under stride 2, which
        # shifts the sampling grid — use explicit symmetric padding
        p = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            use_bias=not self.bn,
            dtype=self.dtype,
        )(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             dtype=jnp.float32)(x)
        if self.relu:
            x = nn.relu(x)
        return x


class DeconvBnRelu(nn.Module):
    """ConvTranspose2d(stride 2) + BN + ReLU (reference module.py:66-107)."""

    features: int
    kernel: int = 3
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(
            self.features,
            (self.kernel, self.kernel),
            strides=(2, 2),
            padding=((1, 2), (1, 2)),
            transpose_kernel=True,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         dtype=jnp.float32)(x)
        if self.relu:
            x = nn.relu(x)
        return x


class Conv3dBnRelu(nn.Module):
    """Conv3d + BN + optional ReLU on (N, D, H, W, C) volumes
    (reference module.py:110-149, 216-233)."""

    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel,) * 3,
            strides=(self.stride,) * 3,
            padding=((p, p),) * 3,
            use_bias=not self.bn,
            dtype=self.dtype,
        )(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             dtype=jnp.float32)(x)
        if self.relu:
            x = nn.relu(x)
        return x


class Deconv3dBnRelu(nn.Module):
    """ConvTranspose3d(stride 2) + BN + ReLU (reference module.py:152-193)."""

    features: int
    kernel: int = 3
    relu: bool = True
    bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(
            self.features,
            (self.kernel,) * 3,
            strides=(2, 2, 2),
            padding=((1, 2),) * 3,
            transpose_kernel=True,
            use_bias=not self.bn,
            dtype=self.dtype,
        )(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             dtype=jnp.float32)(x)
        if self.relu:
            x = nn.relu(x)
        return x


class MLP(nn.Module):
    """Dense stack with ReLU between layers (no activation after the last)."""

    features: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # HIGHEST: true-f32 matmuls (torch 1.13 disables tf32 for matmul, so
        # the reference computes f32; TPU default would round inputs to bf16
        # — enough to destabilize SRDF training through exp(10s) scaling)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype,
                         precision=jax.lax.Precision.HIGHEST)(x)
            if i < len(self.features) - 1:
                x = nn.relu(x)
        return x


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsampling on (..., H, W, C)."""
    x = jnp.repeat(x, 2, axis=-3)
    return jnp.repeat(x, 2, axis=-2)


def upsample_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int],
                      align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize on (N, H, W, C), torch F.interpolate semantics."""
    import jax

    n, h, w, c = x.shape
    oh, ow = out_hw
    method = "linear"
    if align_corners:
        # jax.image has no align_corners mode; implement by sampling the grid.
        from ..ops.grid_sample import grid_sample_2d

        ys = jnp.linspace(-1.0, 1.0, oh)
        xs = jnp.linspace(-1.0, 1.0, ow)
        gx, gy = jnp.meshgrid(xs, ys)
        grid = jnp.stack([gx, gy], axis=-1)[None].repeat(n, axis=0)
        return grid_sample_2d(x, grid, align_corners=True, padding_mode="border")
    return jax.image.resize(x, (n, oh, ow, c), method=method)
