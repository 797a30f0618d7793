"""Tile-local (brick) trilinear sampling of corner-packed volumes.

The render path's dominant cost (57% of device time, BASELINE.md profile) is
scattered one-row gathers from multi-GB corner-packed correlation volumes at
the HBM-regime issue rate (~13.5-15.4 ns/row). The same gather from a small
source runs 2.2-2.5x faster (measured on chip, script/bench_tile_gather.py:
flat 14.6-15.4 ns/row vs brick 6.1-6.7 ns/row, bit-equal, all three cascade
stages). This module exploits it: rays rendered in coherent 2D image tiles
sample only a small frustum sub-brick of each view's volume per (tile,
z-segment), so the sampler bulk-copies that brick with ``dynamic_slice`` and
gathers locally.

Semantics are bit-identical to ``grid_sample_3d_packed`` (same base-index +
clamped-weight math; the gathered ROW for a zero-weight out-of-range point
may differ, its contribution is zero either way) PROVIDED the static brick
dims cover each tile-segment's true footprint — ``ops/brick_plan.py``
computes guaranteed covering dims host-side from the exact projective
geometry, and tests assert zero violations. Local indices are clamped
defensively so undersized dims degrade values, never memory safety.

Reference workload: per-point trilinear sampling of the three cascade stage
volumes, /root/reference/code1/model.py:350-390.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .grid_sample import _unnormalize


def _base_indices(packed_shape, grid, align_corners, padding_mode):
    """Shared with grid_sample_3d_packed: clamped base voxel indices +
    fractional offsets + relevance mask. grid: (NV, P, 3).

    ``relevant`` marks points with any nonzero interpolation weight (every
    coordinate within one voxel of the volume). Irrelevant points contribute
    exactly zero regardless of the row gathered, so the brick sampler may
    read any row for them — and must NOT let their clamped-to-edge base
    indices drag the brick origin away from the real points."""
    _, D, H, W, _ = packed_shape
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)
    z = _unnormalize(grid[..., 2], D, align_corners)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
        z = jnp.clip(z, 0.0, D - 1)
    relevant = ((x > -1.0) & (x < W) & (y > -1.0) & (y < H)
                & (z > -1.0) & (z < D))
    x0 = jnp.clip(jnp.floor(x), 0, W - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1).astype(jnp.int32)
    z0 = jnp.clip(jnp.floor(z), 0, D - 1).astype(jnp.int32)
    return (x0, y0, z0), (x - x0, y - y0, z - z0), relevant


def _lerp_corners(rows, fx, fy, fz):
    """Corner-packed trilinear combine, identical to grid_sample_3d_packed."""
    C = rows.shape[-1] // 8

    def w01(f):
        return jnp.clip(1.0 - jnp.abs(f), 0.0, 1.0), jnp.clip(f, 0.0, 1.0)

    wx0, wx1 = w01(fx)
    wy0, wy1 = w01(fy)
    wz0, wz1 = w01(fz)
    out = 0.0
    for c, (dz, dy, dx) in enumerate(
            [(a, b, cc) for a in (0, 1) for b in (0, 1) for cc in (0, 1)]):
        wgt = ((wz1 if dz else wz0)
               * (wy1 if dy else wy0)
               * (wx1 if dx else wx0))
        out = out + rows[..., c * C:(c + 1) * C] * wgt[..., None]
    return out


def brick_sample_3d_packed(
    packed: jnp.ndarray,                 # (NV, D, H, W, 8*C)
    grid: jnp.ndarray,                   # (NV, ..., 3) normalized (x, y, z)
    brick_yx: Tuple[int, int],           # static (BH, BW) covering dims
    n_seg: int = 4,                      # z segments (seg_d = ceil(D/n_seg))
    n_tiles: int = 1,                    # coherent point groups per call
    align_corners: bool = True,
    padding_mode: str = "zeros",
    return_violations: bool = False,
    c_out: int = None,
):
    """Trilinear sampling via per-(tile, z-segment) volume bricks.

    Points must be grouped: the flattened point axis is split into
    ``n_tiles`` equal contiguous groups, each assumed spatially coherent
    (e.g. the samples of one 2D ray tile). Per (view, tile, segment) the
    sampler computes the xy origin as the masked minimum of that segment's
    base indices, bulk-copies a static (seg_d, BH, BW) brick, and gathers
    rows locally. z origins are static (segment k starts at k*seg_d,
    clamped), so z coverage is guaranteed by construction; xy coverage is
    the caller's contract via ``brick_yx`` (see ops/brick_plan.py).

    Returns (NV, ..., C) samples; with ``return_violations`` also a scalar
    count of points whose xy fell outside their brick (0 when dims cover —
    asserted by tests; production clamps and proceeds).
    """
    assert padding_mode in ("zeros", "border"), padding_mode
    NV, D, H, W, C8 = packed.shape
    BH, BW = int(brick_yx[0]), int(brick_yx[1])
    BH = min(BH, H)
    BW = min(BW, W)
    seg_d = -(-D // n_seg)
    lead = grid.shape[1:-1]
    g = grid.reshape(NV, -1, 3)
    P = g.shape[1]
    assert P % n_tiles == 0, (P, n_tiles)
    pt = P // n_tiles

    (x0, y0, z0), (fx, fy, fz), relevant = _base_indices(
        packed.shape, g, align_corners, padding_mode)

    # group axis: (NV, T, pt)
    x0g = x0.reshape(NV, n_tiles, pt)
    y0g = y0.reshape(NV, n_tiles, pt)
    z0g = z0.reshape(NV, n_tiles, pt)
    rel = relevant.reshape(NV, n_tiles, pt)

    seg = z0g // seg_d                                   # (NV, T, pt)
    seg_ids = jnp.arange(n_seg, dtype=jnp.int32)
    seg_oh = seg[..., None] == seg_ids                   # (NV, T, pt, S)
    # origin = min over RELEVANT points only (zero-weight points may clamp
    # to volume edges far from the tile's true footprint)
    seg_rel = seg_oh & rel[..., None]
    big = jnp.int32(1 << 30)
    oy = jnp.min(jnp.where(seg_rel, y0g[..., None], big), axis=2)  # (NV, T, S)
    ox = jnp.min(jnp.where(seg_rel, x0g[..., None], big), axis=2)
    oy = jnp.clip(oy, 0, H - BH)
    ox = jnp.clip(ox, 0, W - BW)
    oz_tab = jnp.clip(seg_ids * seg_d, 0, max(D - seg_d, 0))     # (S,) static

    def slice_view_tile(vol, oyv, oxv):
        # vol (D, H, W, C8); oyv/oxv (S,) -> (S, seg_d, BH, BW, C8)
        def one(k):
            return jax.lax.dynamic_slice(
                vol, (oz_tab[k], oyv[k], oxv[k], 0), (seg_d, BH, BW, C8))
        return jnp.stack([one(k) for k in range(n_seg)])

    # bricks: (NV, T, S, seg_d, BH, BW, C8)
    bricks = jax.vmap(lambda vol, oyt, oxt: jax.vmap(
        lambda oyv, oxv: slice_view_tile(vol, oyv, oxv))(oyt, oxt)
    )(packed, oy, ox)
    flat = bricks.reshape(NV, n_tiles, n_seg * seg_d * BH * BW, C8)

    # per-point origins via one-hot sums (n_seg is tiny; stays gather-free)
    ohf = seg_oh.astype(jnp.int32)
    oy_p = jnp.sum(ohf * oy[:, :, None, :], axis=-1)     # (NV, T, pt)
    ox_p = jnp.sum(ohf * ox[:, :, None, :], axis=-1)
    oz_p = jnp.sum(ohf * oz_tab[None, None, None, :], axis=-1)

    ly = y0g - oy_p
    lx = x0g - ox_p
    lz = z0g - oz_p
    # only relevant points can be *wrong* when clamped (irrelevant rows are
    # multiplied by exactly-zero weights)
    bad = ((ly < 0) | (ly >= BH) | (lx < 0) | (lx >= BW)) & rel
    loc = (seg * seg_d + lz) * (BH * BW) \
        + jnp.clip(ly, 0, BH - 1) * BW + jnp.clip(lx, 0, BW - 1)

    rows = jnp.take_along_axis(
        flat, loc.reshape(NV, n_tiles, pt, 1), axis=2,
        mode="promise_in_bounds")                        # (NV, T, pt, C8)
    rows = rows.reshape(NV, P, C8)
    out = _lerp_corners(rows, fx, fy, fz).reshape((NV,) + lead + (C8 // 8,))
    if c_out is not None:
        out = out[..., :c_out]
    if return_violations:
        return out, jnp.sum(bad.astype(jnp.int32))
    return out
