"""Bilinear / trilinear grid sampling for TPU (pure XLA gather + lerp).

TPU-native replacement for torch ``F.grid_sample`` (ATen CUDA op), which the
reference uses everywhere (reference: code1/encoder_utils/grid_sample.py:5-31,
fmt/module.py:363, model.py:370-371, utils/gmflow_utils.py:83).

Layout is channels-last: images are (N, H, W, C), volumes are (N, D, H, W, C).
Grids hold normalized coordinates in [-1, 1], ordered (x, y) / (x, y, z) with
x indexing W, y indexing H, z indexing D — identical to torch convention.

Both ``align_corners`` conventions and ``zeros`` / ``border`` padding are
supported and match torch bit-for-bit on CPU (see tests/test_grid_sample.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def in_bounds_mask(grid: jnp.ndarray) -> jnp.ndarray:
    """Mask of grid points whose every coordinate lies in [-1, 1].

    Matches the reference's validity convention (grid_sample.py:13-17).
    Returns float32 mask with shape ``grid.shape[:-1]``.
    """
    ok = jnp.all((grid >= -1.0) & (grid <= 1.0), axis=-1)
    return ok.astype(jnp.float32)


def grid_sample_2d(
    image: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Bilinear sample ``image`` at normalized ``grid`` locations.

    Args:
      image: (N, H, W, C) float array.
      grid:  (N, ..., 2) normalized (x, y) coordinates in [-1, 1].
      align_corners: torch semantics.
      padding_mode: 'zeros' or 'border'.

    Returns:
      (N, ..., C) sampled values.
    """
    assert padding_mode in ("zeros", "border"), padding_mode
    N, H, W, C = image.shape
    lead = grid.shape[1:-1]
    g = grid.reshape(N, -1, 2)
    P = g.shape[1]

    x = _unnormalize(g[..., 0], W, align_corners)
    y = _unnormalize(g[..., 1], H, align_corners)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    # Channels-FIRST gather layout: buffers are (N, C, P) so the huge P axis
    # sits on the 128-lane dimension. Channels-last (N, P, C) puts a small C
    # (8-32) on lanes, and TPU tiling pads it 4-16x — at full render
    # resolution that turned 1.6GB of temps into 8.8GB (v5e OOM).
    flat_t = image.reshape(N, H * W, C).transpose(0, 2, 1)  # (N, C, HW)

    def corner(xi, yi, w):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        v = jnp.take_along_axis(flat_t, idx[:, None, :], axis=2)  # (N, C, P)
        return v * (w * valid.astype(image.dtype))[:, None, :]

    out = (
        corner(x0, y0, (1 - wx) * (1 - wy))
        + corner(x1, y0, wx * (1 - wy))
        + corner(x0, y1, (1 - wx) * wy)
        + corner(x1, y1, wx * wy)
    )
    return out.transpose(0, 2, 1).reshape((N,) + lead + (C,))


def grid_sample_3d(
    volume: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Trilinear sample ``volume`` at normalized ``grid`` locations.

    Args:
      volume: (N, D, H, W, C).
      grid:   (N, ..., 3) normalized (x, y, z); x->W, y->H, z->D (torch order).

    Returns:
      (N, ..., C).
    """
    assert padding_mode in ("zeros", "border"), padding_mode
    N, D, H, W, C = volume.shape
    lead = grid.shape[1:-1]
    g = grid.reshape(N, -1, 3)

    x = _unnormalize(g[..., 0], W, align_corners)
    y = _unnormalize(g[..., 1], H, align_corners)
    z = _unnormalize(g[..., 2], D, align_corners)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
        z = jnp.clip(z, 0.0, D - 1)

    x0f, y0f, z0f = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    wx, wy, wz = x - x0f, y - y0f, z - z0f
    x0, y0, z0 = x0f.astype(jnp.int32), y0f.astype(jnp.int32), z0f.astype(jnp.int32)
    x1, y1, z1 = x0 + 1, y0 + 1, z0 + 1

    # channels-first gathers: see grid_sample_2d layout note
    flat_t = volume.reshape(N, D * H * W, C).transpose(0, 2, 1)  # (N, C, DHW)

    def corner(xi, yi, zi, w):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H) & (zi >= 0) & (zi < D)
        idx = (
            jnp.clip(zi, 0, D - 1) * (H * W)
            + jnp.clip(yi, 0, H - 1) * W
            + jnp.clip(xi, 0, W - 1)
        )
        v = jnp.take_along_axis(flat_t, idx[:, None, :], axis=2)  # (N, C, P)
        return v * (w * valid.astype(volume.dtype))[:, None, :]

    out = (
        corner(x0, y0, z0, (1 - wx) * (1 - wy) * (1 - wz))
        + corner(x1, y0, z0, wx * (1 - wy) * (1 - wz))
        + corner(x0, y1, z0, (1 - wx) * wy * (1 - wz))
        + corner(x1, y1, z0, wx * wy * (1 - wz))
        + corner(x0, y0, z1, (1 - wx) * (1 - wy) * wz)
        + corner(x1, y0, z1, wx * (1 - wy) * wz)
        + corner(x0, y1, z1, (1 - wx) * wy * wz)
        + corner(x1, y1, z1, wx * wy * wz)
    )
    return out.transpose(0, 2, 1).reshape((N,) + lead + (C,))
