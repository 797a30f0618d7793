"""GMFlow sampling helpers (reference utils/gmflow_utils.py:9-112).

The live reference config calls sample_features_by_grid with
local_radius=0, which reduces to a plain bilinear grid sample; radius > 0
averages bilinear samples over a (2r+1)^2 pixel window around each point.
split_feature / merge_splits (GMFlow window-attention helpers) are unused by
the reference live path and are provided for completeness.
"""
from __future__ import annotations

import jax.numpy as jnp

from .grid_sample import grid_sample_2d


def normalize_img(img0: jnp.ndarray, img1: jnp.ndarray):
    """ImageNet normalization of a pair (gmflow_utils.py:100-112)."""
    mean = jnp.array([0.485, 0.456, 0.406], img0.dtype)
    std = jnp.array([0.229, 0.224, 0.225], img0.dtype)
    return (img0 - mean) / std, (img1 - mean) / std


def sample_features_by_grid(
    feats: jnp.ndarray,          # (N, H, W, C)
    grid: jnp.ndarray,           # (N, P, 2) normalized (x, y)
    align_corners: bool = True,
    padding_mode: str = "border",
    local_radius: int = 0,
) -> jnp.ndarray:
    """Bilinear sample; radius>0 averages a local pixel window
    (gmflow_utils.py:61-97)."""
    if local_radius <= 0:
        return grid_sample_2d(feats, grid, align_corners=align_corners,
                              padding_mode=padding_mode)
    n, h, w, _ = feats.shape
    r = local_radius
    # pixel offsets -> normalized offsets
    dx = jnp.arange(-r, r + 1, dtype=grid.dtype)
    dy = jnp.arange(-r, r + 1, dtype=grid.dtype)
    offs = jnp.stack(jnp.meshgrid(dx, dy, indexing="xy"), -1).reshape(-1, 2)
    scale = jnp.array([2.0 / max(w - 1, 1), 2.0 / max(h - 1, 1)], grid.dtype)
    out = 0.0
    for o in offs:
        g = grid + o * scale
        out = out + grid_sample_2d(feats, g, align_corners=align_corners,
                                   padding_mode=padding_mode)
    return out / offs.shape[0]


def split_feature(feature: jnp.ndarray, num_splits: int) -> jnp.ndarray:
    """(N, H, W, C) -> (N*num_splits^2, H/s, W/s, C) window split
    (gmflow_utils.py:9-28)."""
    n, h, w, c = feature.shape
    s = num_splits
    x = feature.reshape(n, s, h // s, s, w // s, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n * s * s, h // s, w // s, c)


def merge_splits(splits: jnp.ndarray, num_splits: int) -> jnp.ndarray:
    """Inverse of split_feature (gmflow_utils.py:31-49)."""
    s = num_splits
    ns, hs, ws, c = splits.shape
    n = ns // (s * s)
    x = splits.reshape(n, s, s, hs, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, s * hs, s * ws, c)
