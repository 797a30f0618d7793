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

    # Channels-last row gathers: the TPU-fast gather form indexes the
    # second-minor axis with rows of C values on lanes. Rows with C < 128
    # pad to a full lane tile, so HOT paths should corner-pack first
    # (pack_image_corners + grid_sample_2d_packed: one 4C row per sample).
    # Gathering along the lane axis instead (channels-first) lowers to a
    # pathologically slow path (~100x) — do not "optimize" back to it.
    flat = image.reshape(N, H * W, C)

    def corner(xi, yi, w):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        # indices are clamped above; promise_in_bounds skips the fill
        # select pass XLA otherwise appends to every gather
        v = jnp.take_along_axis(flat, idx[..., None], axis=1,
                                mode="promise_in_bounds")  # (N, P, C)
        return v * (w * valid.astype(image.dtype))[..., None]

    out = (
        corner(x0, y0, (1 - wx) * (1 - wy))
        + corner(x1, y0, wx * (1 - wy))
        + corner(x0, y1, (1 - wx) * wy)
        + corner(x1, y1, wx * wy)
    )
    return out.reshape((N,) + lead + (C,))


def pack_image_corners(img: jnp.ndarray,
                       corner_pad: int | None = None) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H, W, 4*C'): entry (y, x) holds the 2x2 corner
    neighborhood starting at (y, x), zero-padded at the +1 edges. One gather
    row per bilinear sample instead of four (see pack_volume_corners).

    ``corner_pad`` zero-pads each corner block to C' = corner_pad channels.
    Measured motivation (script/bench_warp_gather.py, v5e): 32-lane f32
    rows from a stage-3-sized warp source gather at 68 ns/row while the
    SAME rows lane-padded to 128 go at 29 ns/row — the padding more than
    pays for its 4x bytes. Samplers must then slice via ``c_out``."""
    parts = []
    c = img.shape[-1]
    pad_c = 0 if corner_pad is None else corner_pad - c
    assert pad_c >= 0, (corner_pad, c)
    for dy in (0, 1):
        for dx in (0, 1):
            shifted = img[:, dy:, dx:, :]
            pad = ((0, 0), (0, dy), (0, dx), (0, pad_c))
            parts.append(jnp.pad(shifted, pad))
    return jnp.concatenate(parts, axis=-1)


def grid_sample_2d_packed(
    packed: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "zeros",
    c_out: int | None = None,
) -> jnp.ndarray:
    """Bilinear sampling from a corner-packed image (see pack_image_corners).
    Bit-equivalent to grid_sample_2d on the unpacked image; one gather per
    point instead of four. ``c_out`` slices back to the true channel count
    when the pack used ``corner_pad``.

    NaN caveat: indices are clamped for every FINITE coordinate, so
    promise_in_bounds is safe — but non-finite grid values (NaN projections
    from degenerate poses) int-cast to arbitrary in-buffer indices and read
    garbage rather than degrading predictably. Sanitize upstream if poses
    can be degenerate."""
    assert padding_mode in ("zeros", "border"), padding_mode
    N, H, W, C4 = packed.shape
    C = C4 // 4
    lead = grid.shape[1:-1]
    g = grid.reshape(N, -1, 2)

    x = _unnormalize(g[..., 0], W, align_corners)
    y = _unnormalize(g[..., 1], H, align_corners)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)

    x0 = jnp.clip(jnp.floor(x), 0, W - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1).astype(jnp.int32)
    fx = x - x0.astype(x.dtype)
    fy = y - y0.astype(y.dtype)

    idx = y0 * W + x0
    flat = packed.reshape(N, H * W, C4)
    rows = jnp.take_along_axis(flat, idx[..., None], axis=1,
                               mode="promise_in_bounds")  # (N, P, 4C)

    def w01(f):
        return jnp.clip(1.0 - jnp.abs(f), 0.0, 1.0), jnp.clip(f, 0.0, 1.0)

    wx0, wx1 = w01(fx)
    wy0, wy1 = w01(fy)
    cv = C if c_out is None else c_out
    out = 0.0
    for c, (dy, dx) in enumerate([(a, b) for a in (0, 1) for b in (0, 1)]):
        wgt = (wy1 if dy else wy0) * (wx1 if dx else wx0)
        out = out + rows[..., c * C:c * C + cv] * wgt[..., None]
    return out.reshape((N,) + lead + (cv,))


def grid_sample_2d_dot_packed(
    packed: jnp.ndarray,
    grid: jnp.ndarray,
    ref: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """``dot(grid_sample_2d_packed(packed, grid)[n, p, :C], ref[p % R, :C])``
    without ever leaving the packed lane layout: the four bilinear corner
    weights and the reference feature fold into ONE full-lane multiply
    against the raw gather rows, then a single lane reduce. Returns (N, P).

    Motivation (train-step profile, BASELINE.md round 4): with lane-padded
    packs the per-corner ``c_out`` slices force padded relayout copies and
    a 4-term add tree; here no sub-row slice exists at all. Numerics differ
    from sample-then-dot only by sum reassociation (f32 ~1e-6 rel).

    ref: (R, C_true) with P % R == 0, points ordered depth-major (P//R, R)
    — the homography-warp layout of cascade._correlate_chunked. C_true may
    be smaller than the pack's per-corner block (lane padding); the missing
    ref lanes are treated as zero, matching the zero padding in the rows.
    """
    assert padding_mode in ("zeros", "border"), padding_mode
    N, H, W, C4 = packed.shape
    C = C4 // 4
    g = grid.reshape(N, -1, 2)
    P = g.shape[1]
    R, Ct = ref.shape
    assert P % R == 0 and Ct <= C, (P, R, Ct, C)

    x = _unnormalize(g[..., 0], W, align_corners)
    y = _unnormalize(g[..., 1], H, align_corners)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
    x0 = jnp.clip(jnp.floor(x), 0, W - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1).astype(jnp.int32)
    fx = (x - x0.astype(x.dtype))[..., None]
    fy = (y - y0.astype(y.dtype))[..., None]

    idx = y0 * W + x0
    flat = packed.reshape(N, H * W, C4)
    rows = jnp.take_along_axis(flat, idx[..., None], axis=1,
                               mode="promise_in_bounds")  # (N, P, 4C)

    wx1 = jnp.clip(fx, 0.0, 1.0)
    wx0 = jnp.clip(1.0 - jnp.abs(fx), 0.0, 1.0)
    wy1 = jnp.clip(fy, 0.0, 1.0)
    wy0 = jnp.clip(1.0 - jnp.abs(fy), 0.0, 1.0)
    if Ct < C:
        ref = jnp.pad(ref, ((0, 0), (0, C - Ct)))
    reft = jnp.broadcast_to(ref[None, None], (N, P // R, R, C)) \
        .reshape(N, P, C)
    refw = jnp.concatenate([
        wy0 * wx0 * reft, wy0 * wx1 * reft,
        wy1 * wx0 * reft, wy1 * wx1 * reft,
    ], axis=-1)  # (N, P, 4C) — broadcasts, fused into the consumer
    return jnp.sum(rows * refw, axis=-1)


def pack_volume_corners(vol: jnp.ndarray,
                        corner_pad: int | None = None) -> jnp.ndarray:
    """(N, D, H, W, C) -> (N, D, H, W, 8*C'): entry (z, y, x) holds the
    2x2x2 corner neighborhood starting at (z, y, x), zero-padded at the +1
    edges (matching 'zeros' padding for the high side).

    Trades 8x volume memory for ONE gather row per trilinear sample instead
    of eight: on TPU a gather row of C<=16 values pads to a full 128-lane
    tile, so 8 tiny rows cost ~16x the bytes of one 8C row. Use with
    grid_sample_3d_packed.

    ``corner_pad`` zero-pads each corner block to C' = corner_pad channels
    (e.g. 9 -> 16, making the packed row exactly 128 lanes). A lane-full
    row lets XLA keep ONE layout for the volume across flat gathers AND the
    brick path's dynamic_slice: measured on chip, slicing a 72-lane volume
    inside the render chunk loop forces padded relayout copies of every
    volume (7.03 GB of HLO temps -> OOM at 800x640), while 128-lane
    volumes slice in place (0.07 GB temps). Samplers must then be told the
    true channel count via ``c_out``.
    """
    parts = []
    c = vol.shape[-1]
    pad_c = 0 if corner_pad is None else corner_pad - c
    assert pad_c >= 0, (corner_pad, c)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                shifted = vol[:, dz:, dy:, dx:, :]
                pad = ((0, 0), (0, dz), (0, dy), (0, dx), (0, pad_c))
                parts.append(jnp.pad(shifted, pad))
    return jnp.concatenate(parts, axis=-1)


def grid_sample_3d_packed(
    packed: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "zeros",
    c_out: int | None = None,
) -> jnp.ndarray:
    """Trilinear sampling from a corner-packed volume (see
    pack_volume_corners). Bit-equivalent to grid_sample_3d on the unpacked
    volume (tests/test_grid_sample.py), one gather per point instead of 8.

    Args:
      packed: (N, D, H, W, 8*C).
      grid:   (N, ..., 3) normalized (x, y, z) torch-order coordinates.
      c_out:  true channel count when the pack used ``corner_pad`` (the
              trailing C - c_out channels per corner are zero padding).

    Returns:
      (N, ..., c_out or C).
    """
    assert padding_mode in ("zeros", "border"), padding_mode
    N, D, H, W, C8 = packed.shape
    C = C8 // 8
    lead = grid.shape[1:-1]
    g = grid.reshape(N, -1, 3)

    x = _unnormalize(g[..., 0], W, align_corners)
    y = _unnormalize(g[..., 1], H, align_corners)
    z = _unnormalize(g[..., 2], D, align_corners)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
        z = jnp.clip(z, 0.0, D - 1)

    # One row holds all 8 corners of the cell at the CLAMPED base index.
    # Zero-padding semantics follow from the clamped-base weight scheme:
    # with f = coord - clamped_base, w0 = clip(1-|f|, 0, 1) and
    # w1 = clip(f, 0, 1) reproduce bilinear weights in the interior, fade
    # the surviving corner correctly within one voxel outside the low edge,
    # and vanish beyond; the packing's zero pad handles the high edge.
    x0 = jnp.clip(jnp.floor(x), 0, W - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1).astype(jnp.int32)
    z0 = jnp.clip(jnp.floor(z), 0, D - 1).astype(jnp.int32)
    fx = x - x0.astype(x.dtype)
    fy = y - y0.astype(y.dtype)
    fz = z - z0.astype(z.dtype)

    idx = (z0 * H + y0) * W + x0
    flat = packed.reshape(N, D * H * W, C8)
    rows = jnp.take_along_axis(flat, idx[..., None], axis=1,
                               mode="promise_in_bounds")  # (N, P, 8C)

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
    out = out.reshape((N,) + lead + (C,))
    return out if c_out is None else out[..., :c_out]


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

    # channels-last row gathers: see grid_sample_2d layout note
    flat = volume.reshape(N, D * H * W, C)

    def corner(xi, yi, zi, w):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H) & (zi >= 0) & (zi < D)
        idx = (
            jnp.clip(zi, 0, D - 1) * (H * W)
            + jnp.clip(yi, 0, H - 1) * W
            + jnp.clip(xi, 0, W - 1)
        )
        v = jnp.take_along_axis(flat, idx[..., None], axis=1,
                                mode="promise_in_bounds")  # (N, P, C)
        return v * (w * valid.astype(volume.dtype))[..., None]

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
    return out.reshape((N,) + lead + (C,))
