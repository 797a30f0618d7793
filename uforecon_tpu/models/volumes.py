"""Feature volumes: correlation-frustum head and global feature grid.

TPU-native rewrite of the reference volume builders:
  * CostRegNetWeight — 3D U-Net over each cascade cost volume emitting an
    8-ch feature volume + sigmoid weight volume
    (reference: code1/encoder_utils/fmt/module.py:502-543,
    code1/feature_volume.py:100-121 MVSVolume);
  * FeatureVolume — global volume_reso^3 grid projected into every view,
    mask-weighted mean/var of compressed features, 3D regularization U-Net
    (reference: code1/feature_volume.py:11-97, encoder_utils/cnn3d.py:42-73).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import grid_sample_2d, in_bounds_mask
from .layers import Conv3dBnRelu, Deconv3dBnRelu, MLP


class CostRegNetWeight(nn.Module):
    """3D U-Net -> (8-ch feature volume, 1-ch sigmoid weight volume).

    Unlike CostRegNet, the reference uses *plain* Conv3d here (no BN/ReLU,
    module.py:505-526); we keep that: each level is conv + residual add.
    """

    base_channels: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # x: (N, D, H, W, Cin)
        b = self.base_channels
        # explicit torch-equivalent padding: symmetric (1,1) for the convs
        # (flax SAME is asymmetric under stride 2), ((1,2)+transposed kernel)
        # for convT(k3,s2,p1,op1) — see models/layers.py
        conv = lambda f, s, name: nn.Conv(
            f, (3, 3, 3), strides=(s,) * 3, padding=((1, 1),) * 3,
            dtype=self.dtype, name=name,
        )
        deconv = lambda f, name: nn.ConvTranspose(
            f, (3, 3, 3), strides=(2, 2, 2), padding=((1, 2),) * 3,
            transpose_kernel=True, dtype=self.dtype, name=name,
        )
        c0 = conv(b, 1, "conv0")(x)
        c2 = conv(b * 2, 1, "conv2")(conv(b * 2, 2, "conv1")(c0))
        c4 = conv(b * 4, 1, "conv4")(conv(b * 4, 2, "conv3")(c2))
        z = conv(b * 8, 1, "conv6")(conv(b * 8, 2, "conv5")(c4))
        z = c4 + deconv(b * 4, "conv7")(z)
        z = c2 + deconv(b * 2, "conv9")(z)
        z = c0 + deconv(b, "conv11")(z)
        features = nn.Conv(8, (3, 3, 3), padding="SAME", use_bias=False,
                           dtype=self.dtype, name="features")(z)
        weights = nn.sigmoid(
            nn.Conv(1, (3, 3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="weights")(z)
        )
        return features, weights


class VolumeRegularization(nn.Module):
    """16->48->16ch 3D U-Net for the featuregrid path (cnn3d.py:42-73)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x0 = Conv3dBnRelu(16, dtype=self.dtype)(x, train)
        x1 = Conv3dBnRelu(16, stride=2, dtype=self.dtype)(x0, train)
        x1 = Conv3dBnRelu(16, dtype=self.dtype)(x1, train)
        x2 = Conv3dBnRelu(32, stride=2, dtype=self.dtype)(x1, train)
        x2 = Conv3dBnRelu(32, dtype=self.dtype)(x2, train)
        x3 = Conv3dBnRelu(48, stride=2, dtype=self.dtype)(x2, train)
        x3 = Conv3dBnRelu(48, dtype=self.dtype)(x3, train)

        y2 = Deconv3dBnRelu(32, dtype=self.dtype)(x3, train)
        y1 = Deconv3dBnRelu(16, dtype=self.dtype)(y2 + x2, train)
        y0 = Deconv3dBnRelu(16, dtype=self.dtype)(y1 + x1, train)
        return nn.Conv(16, (3, 3, 3), padding="SAME", dtype=self.dtype)(y0 + x0)


class FeatureVolume(nn.Module):
    """Global feature grid in [-1,1]^3 (feature_volume.py:11-97).

    All volume_reso^3 voxels are projected into every source view at once,
    stage-1 features grid-sampled, compressed by an MLP, and the per-view
    mask-weighted mean/variance regularized by a 3D U-Net.
    """

    volume_reso: int = 96
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,        # (NV, H, W, C) stage-1 features
        source_poses: jnp.ndarray,  # (NV, 4, 4) NDC projection matrices
        train: bool = False,
    ) -> jnp.ndarray:
        r = self.volume_reso
        nv = feats.shape[0]

        line = np.linspace(-1.0, 1.0, r, dtype=np.float32)
        gx, gy, gz = np.meshgrid(line, line, line, indexing="ij")
        xyz = jnp.asarray(np.stack([gx, gy, gz], axis=-1).reshape(-1, 3))

        pts = jnp.concatenate([xyz, jnp.ones_like(xyz[:, :1])], axis=-1)
        proj = jnp.einsum("vij,nj->vni", source_poses, pts,
                          precision=jax.lax.Precision.HIGHEST)
        depth = proj[..., 2]
        valid = (depth > 0).astype(jnp.float32)
        grid = proj[..., :2] / jnp.where(depth == 0, 1e-8, depth)[..., None]

        sampled = grid_sample_2d(feats, grid[:, :, None], align_corners=False,
                                 padding_mode="zeros")[:, :, 0]  # (NV, R^3, C)
        mask = in_bounds_mask(grid) * valid  # (NV, R^3)
        weight = mask / (jnp.sum(mask, axis=0, keepdims=True) + 1e-8)

        compressed = MLP((32, 16, 8), dtype=self.dtype)(sampled)  # (NV, R^3, 8)
        w = weight[..., None]
        mean = jnp.sum(compressed * w, axis=0)
        var = jnp.sum(w * (compressed - mean[None]) ** 2, axis=0)
        mean_var = jnp.concatenate([mean, var], axis=-1).reshape(r, r, r, 16)
        # reference permutes to (C, Z, Y, X); channels-last equivalent is
        # reversing the spatial order to (Z, Y, X, C) (feature_volume.py:92)
        mean_var = jnp.transpose(mean_var, (2, 1, 0, 3))

        return VolumeRegularization(dtype=self.dtype)(mean_var[None], train)[0]
