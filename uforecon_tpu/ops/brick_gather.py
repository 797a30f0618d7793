"""Tile-local (brick) trilinear sampling of corner-packed volumes.

The render path's dominant cost (57% of device time, BASELINE.md profile) is
scattered one-row gathers from multi-GB corner-packed correlation volumes at
the HBM-regime issue rate (~13.5-15.4 ns/row). The same gather from a small
source runs 2.2-2.5x faster (measured on chip, script/bench_tile_gather.py:
flat 14.6-15.4 ns/row vs brick 6.1-6.7 ns/row, bit-equal, all three cascade
stages). This module exploits it: rays rendered in coherent 2D image tiles
and segmented along the ray (uniform-t slabs — thin world-space shells, the
segmentation that bounds parallax) touch only a small sub-brick of each
view's volume per (tile, segment); the sampler bulk-copies that brick with
``dynamic_slice`` and gathers locally.

Semantics are bit-identical to ``grid_sample_3d_packed`` (same base-index +
clamped-weight math; the gathered ROW for a zero-weight out-of-range point
may differ, its contribution is zero either way) PROVIDED the static brick
dims cover each cell's true footprint — ``ops/brick_plan.py`` computes
guaranteed covering dims AND per-cell origins host-side from the exact
projective geometry and flags the (rare, epipole-adjacent) tiles whose
cells exceed them, which the renderer routes through the flat path instead.
Origins arrive as data (not from the points), so bricks build once per
chunk and serve both render passes. Local indices are clamped defensively
so undersized dims degrade values, never memory safety.

Reference workload: per-point trilinear sampling of the three cascade stage
volumes, /root/reference/code1/model.py:350-390.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

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


def _norm_dims(brick_dims, n_seg, D, H, W):
    if isinstance(brick_dims[0], int):
        brick_dims = tuple(brick_dims for _ in range(n_seg))
    assert len(brick_dims) == n_seg, (len(brick_dims), n_seg)
    return [(min(int(b[0]), D), min(int(b[1]), H), min(int(b[2]), W))
            for b in brick_dims]


def build_bricks(
    packed: jnp.ndarray,       # (NV, D, H, W, C8)
    origins: jnp.ndarray,      # (T, S, NV, 3) int32 (z, y, x) brick origins
    brick_dims,                # static per-seg ((BD, BH, BW), ...) | triple
    n_seg: int = 8,
) -> jnp.ndarray:
    """Bulk-copy every (tile, segment, view) brick into one flat buffer.

    Returns (NV, T, total_rows, C8) with per-segment row blocks laid out
    consecutively (offsets = cumsum of per-seg rows). Callers build ONCE per
    chunk and share the buffer between the coarse and fine passes — brick
    origins come from the host planner's hull minima (ops/brick_plan.py),
    not from the points, so they are pass-independent.
    """
    NV, D, H, W, C8 = packed.shape
    dims = _norm_dims(brick_dims, n_seg, D, H, W)

    def slice_view_tile(vol, org_t):
        # vol (D, H, W, C8); org_t (S, 3) -> flat (sum_k rows_k, C8)
        parts = []
        for k in range(n_seg):
            BD, BH, BW = dims[k]
            b = jax.lax.dynamic_slice(
                vol, (org_t[k, 0], org_t[k, 1], org_t[k, 2], 0),
                (BD, BH, BW, C8))
            parts.append(b.reshape(BD * BH * BW, C8))
        return jnp.concatenate(parts, axis=0)

    org_vt = jnp.transpose(origins, (2, 0, 1, 3))        # (NV, T, S, 3)
    return jax.vmap(lambda vol, ot: jax.vmap(
        lambda o: slice_view_tile(vol, o))(ot))(packed, org_vt)


def brick_lookup(
    flat: jnp.ndarray,         # (NV, T, total_rows, C8) from build_bricks
    origins: jnp.ndarray,      # (T, S, NV, 3) the SAME origins
    vol_shape,                 # static (D, H, W) of the underlying volume
    brick_dims,                # static per-seg dims matching build_bricks
    grid: jnp.ndarray,         # (NV, ..., 3) normalized (x, y, z)
    seg: jnp.ndarray,          # (...,) int32 ray-slab index, view-shared
    n_seg: int = 8,
    align_corners: bool = True,
    padding_mode: str = "zeros",
    return_violations: bool = False,
    c_out: int = None,
):
    """Trilinear sampling from pre-built per-(tile, segment) bricks.

    Bit-identical to grid_sample_3d_packed on the full volume whenever the
    planner-certified dims cover (uncertified tiles are routed to the flat
    path by the caller via lax.cond). Local indices clamp defensively, so
    undersized dims degrade values, never memory safety; with
    ``return_violations`` a count of nonzero-weight points outside their
    brick is returned (0 under certification — asserted in tests).
    """
    assert padding_mode in ("zeros", "border"), padding_mode
    NV, n_tiles, _, C8 = flat.shape
    D, H, W = (int(v) for v in vol_shape)
    dims = _norm_dims(brick_dims, n_seg, D, H, W)
    lead = grid.shape[1:-1]
    g = grid.reshape(NV, -1, 3)
    P = g.shape[1]
    assert P % n_tiles == 0, (P, n_tiles)
    pt = P // n_tiles

    (x0, y0, z0), (fx, fy, fz), relevant = _base_indices(
        (NV, D, H, W, C8), g, align_corners, padding_mode)

    x0g = x0.reshape(NV, n_tiles, pt)
    y0g = y0.reshape(NV, n_tiles, pt)
    z0g = z0.reshape(NV, n_tiles, pt)
    seg = jnp.broadcast_to(seg.reshape(-1), (NV, P)).reshape(NV, n_tiles, pt)

    seg_ids = jnp.arange(n_seg, dtype=jnp.int32)
    seg_oh = seg[..., None] == seg_ids                   # (NV, T, pt, S)
    ohf = seg_oh.astype(jnp.int32)
    org = jnp.transpose(origins, (2, 0, 1, 3))           # (NV, T, S, 3)

    def pick(tab):                                       # (..., S) tables
        return jnp.sum(ohf * tab, axis=-1)               # (NV, T, pt)

    oz_p = pick(org[..., None, :, 0])
    oy_p = pick(org[..., None, :, 1])
    ox_p = pick(org[..., None, :, 2])
    bdk = jnp.asarray([d[0] for d in dims], jnp.int32)
    bhk = jnp.asarray([d[1] for d in dims], jnp.int32)
    bwk = jnp.asarray([d[2] for d in dims], jnp.int32)
    rows_per_seg = [d[0] * d[1] * d[2] for d in dims]
    offsets = np.concatenate([[0], np.cumsum(rows_per_seg)[:-1]]).astype(
        np.int32)
    bd_p = pick(bdk[None, None, None, :])
    bh_p = pick(bhk[None, None, None, :])
    bw_p = pick(bwk[None, None, None, :])
    off_p = pick(jnp.asarray(offsets)[None, None, None, :])

    lz = z0g - oz_p
    ly = y0g - oy_p
    lx = x0g - ox_p
    loc = (off_p
           + (jnp.clip(lz, 0, bd_p - 1) * bh_p
              + jnp.clip(ly, 0, bh_p - 1)) * bw_p
           + jnp.clip(lx, 0, bw_p - 1))

    rows = jnp.take_along_axis(
        flat, loc.reshape(NV, n_tiles, pt, 1), axis=2,
        mode="promise_in_bounds")                        # (NV, T, pt, C8)
    rows = rows.reshape(NV, P, C8)
    out = _lerp_corners(rows, fx, fy, fz).reshape((NV,) + lead + (C8 // 8,))
    if c_out is not None:
        out = out[..., :c_out]
    if return_violations:
        # only relevant points can be *wrong* when clamped (irrelevant rows
        # are multiplied by exactly-zero weights)
        rel = relevant.reshape(NV, n_tiles, pt)
        bad = ((lz < 0) | (lz >= bd_p) | (ly < 0) | (ly >= bh_p)
               | (lx < 0) | (lx >= bw_p)) & rel
        return out, jnp.sum(bad.astype(jnp.int32))
    return out


def brick_sample_coarse_packed(
    packed: jnp.ndarray,       # (NV, D, H, W, 8*C)
    grid: jnp.ndarray,         # (NV, RN, SN, 3) normalized (x, y, z)
    brick_dims,                # static per-seg dims | one triple
    origins: jnp.ndarray,      # (T, S, NV, 3) planner hull minima
    n_seg: int = 8,
    align_corners: bool = True,
    padding_mode: str = "zeros",
    return_violations: bool = False,
    c_out: int = None,
):
    """Brick sampling for STRATIFIED coarse samples: static segment blocks.

    Coarse sampling is stratified (z_i in [near + i*step, near + (i+1)*step],
    ops/sampling.py), so sample i of every ray lies in along-ray slab
    i // (SN/S) BY CONSTRUCTION — the per-segment point sets are static
    sample-index blocks. Each (tile, segment, view) gathers its block
    directly from its own small brick: no per-point segment one-hots, no
    concatenated mega-buffer (whose extra copy + large gather source erased
    the microbenchmark's 2.2-2.5x win — measured ~1.0x). Importance (fine)
    samples have data-dependent segments and stay on the flat path.

    Requires SN % n_seg == 0 and RN % T == 0 (T from origins).
    """
    assert padding_mode in ("zeros", "border"), padding_mode
    NV, D, H, W, C8 = packed.shape
    dims = _norm_dims(brick_dims, n_seg, D, H, W)
    _, RN, SN, _ = grid.shape
    T = origins.shape[0]
    assert RN % T == 0 and SN % n_seg == 0, (RN, T, SN, n_seg)
    rpt = RN // T
    m = SN // n_seg

    (x0, y0, z0), (fx, fy, fz), relevant = _base_indices(
        packed.shape, grid.reshape(NV, -1, 3), align_corners, padding_mode)

    def blk(a):
        return a.reshape(NV, T, rpt, n_seg, m)

    x0b, y0b, z0b = blk(x0), blk(y0), blk(z0)

    parts = []
    bad_total = 0
    for s in range(n_seg):
        BD, BH, BW = dims[s]
        org_s = jnp.transpose(origins[:, s], (1, 0, 2))    # (NV, T, 3)

        def per_view(vol, ot):
            def per_tile(o):
                b = jax.lax.dynamic_slice(
                    vol, (o[0], o[1], o[2], 0), (BD, BH, BW, C8))
                return b.reshape(BD * BH * BW, C8)
            return jax.vmap(per_tile)(ot)

        bricks = jax.vmap(per_view)(packed, org_s)         # (NV, T, rows, C8)

        lz = z0b[..., s, :] - org_s[..., 0][..., None, None]   # (NV,T,rpt,m)
        ly = y0b[..., s, :] - org_s[..., 1][..., None, None]
        lx = x0b[..., s, :] - org_s[..., 2][..., None, None]
        loc = ((jnp.clip(lz, 0, BD - 1) * BH
                + jnp.clip(ly, 0, BH - 1)) * BW
               + jnp.clip(lx, 0, BW - 1))
        rows = jnp.take_along_axis(
            bricks, loc.reshape(NV, T, rpt * m, 1), axis=2,
            mode="promise_in_bounds")                      # (NV, T, rpt*m, C8)
        # lerp per segment: concatenating 9-ch outputs copies 7x fewer
        # bytes than concatenating the 8-corner rows
        out_s = _lerp_corners(rows.reshape(NV, T, rpt, m, C8),
                              blk(fx)[..., s, :], blk(fy)[..., s, :],
                              blk(fz)[..., s, :])
        parts.append(out_s)
        if return_violations:
            bad = ((lz < 0) | (lz >= BD) | (ly < 0) | (ly >= BH)
                   | (lx < 0) | (lx >= BW))
            rel_s = blk(relevant)[..., s, :]
            bad_total = bad_total + jnp.sum((bad & rel_s).astype(jnp.int32))

    out = jnp.concatenate(parts, axis=3).reshape(NV, RN, SN, C8 // 8)
    if c_out is not None:
        out = out[..., :c_out]
    if return_violations:
        return out, bad_total
    return out


def brick_sample_coarse_mxu(
    packed: jnp.ndarray,       # (NV, D, H, W, 8*C)
    grid: jnp.ndarray,         # (NV, RN, SN, 3) normalized (x, y, z)
    brick_dims,                # static per-seg dims | one triple
    origins: jnp.ndarray,      # (T, S, NV, 3) planner hull minima
    n_seg: int = 8,
    align_corners: bool = True,
    padding_mode: str = "zeros",
    return_violations: bool = False,
    c_out: int = None,
):
    """Gather-free brick sampling: trilinear interpolation as MXU matmuls.

    Same blocking contract as brick_sample_coarse_packed (stratified coarse
    samples -> static per-segment sample blocks), but instead of per-row
    gathers from the brick, each point's trilinear read becomes a dense
    contraction against the WHOLE brick: per axis a 2-hot interpolation-
    weight vector (1-f at base, f at base+1, masked by volume validity =
    torch zeros-padding), the two largest brick axes contracted on the MXU
    (weights outer-product x brick), the smallest reduced on the VPU.
    FLOP/point = brick_rows x C — cheap because planner bricks are small
    (~0.5-1.2k rows) — and the scattered-gather issue-rate bottleneck
    (~74M rows/s, BASELINE.md) disappears entirely.

    Consumes the same corner-packed volume as the gather samplers (the
    corner-(0,0,0) channel block IS the raw volume), so no extra storage.
    Values match grid_sample_3d_packed to float-association order (~1e-7
    at HIGHEST; UFO_KERNEL_PRECISION=high uses HIGH, ~1e-6) — parity-gated
    like the fused kernels rather than bit-equal.

    Reference workload: per-point trilinear volume sampling,
    /root/reference/code1/model.py:350-390.
    """
    from .kernel_precision import forward_precision

    assert padding_mode in ("zeros", "border"), padding_mode
    NV, D, H, W, C8 = packed.shape
    C = C8 // 8
    vol = packed[..., :C]      # corner-(0,0,0) block = the raw volume values
    dims = _norm_dims(brick_dims, n_seg, D, H, W)
    _, RN, SN, _ = grid.shape
    T = origins.shape[0]
    assert RN % T == 0 and SN % n_seg == 0, (RN, T, SN, n_seg)
    rpt = RN // T
    m = SN // n_seg

    (x0, y0, z0), (fx, fy, fz), relevant = _base_indices(
        packed.shape, grid.reshape(NV, -1, 3), align_corners, padding_mode)

    # points of segment s = static sample-index block [:, :, :, s, :]
    def seg_of(a, s):
        return a.reshape(NV, T, rpt, n_seg, m)[:, :, :, s].reshape(
            NV, T, rpt * m)

    def weights_1d(base, frac, size, bdim, org):
        """2-hot (NV, T, P, bdim) interpolation weights in LOCAL brick
        coords, volume-validity-masked (zeros padding)."""
        la = base - org[..., None]                       # (NV, T, P)
        w0 = jnp.clip(1.0 - jnp.abs(frac), 0.0, 1.0)
        w1 = jnp.clip(frac, 0.0, 1.0)
        w1 = w1 * (base + 1 <= size - 1)                 # volume edge -> 0
        ids = jnp.arange(bdim, dtype=jnp.int32)
        sel0 = (la[..., None] == ids).astype(jnp.float32)
        sel1 = (la[..., None] + 1 == ids).astype(jnp.float32)
        w = w0[..., None] * sel0 + w1[..., None] * sel1
        bad0 = (w0 > 0) & ((la < 0) | (la > bdim - 1))
        bad1 = (w1 > 0) & ((la + 1 < 0) | (la + 1 > bdim - 1))
        return w, (bad0 | bad1)

    parts = []
    bad_total = 0
    for s in range(n_seg):
        BD, BH, BW = dims[s]
        org_s = jnp.transpose(origins[:, s], (1, 0, 2))    # (NV, T, 3)

        def per_view(v3, ot):
            def per_tile(o):
                return jax.lax.dynamic_slice(
                    v3, (o[0], o[1], o[2], 0), (BD, BH, BW, C))
            return jax.vmap(per_tile)(ot)

        bricks = jax.vmap(per_view)(vol, org_s)     # (NV, T, BD, BH, BW, C)

        wz, badz = weights_1d(seg_of(z0, s), seg_of(fz, s), D, BD,
                              org_s[..., 0])
        wy, bady = weights_1d(seg_of(y0, s), seg_of(fy, s), H, BH,
                              org_s[..., 1])
        wx, badx = weights_1d(seg_of(x0, s), seg_of(fx, s), W, BW,
                              org_s[..., 2])

        # contract the two largest axes on the MXU, reduce the smallest on
        # the VPU: FLOP identical for any split, intermediates smallest
        order = sorted(range(3), key=lambda i: -(BD, BH, BW)[i])
        ws = (wz, wy, wx)
        hp = forward_precision()
        a, b = sorted(order[:2])
        keep = order[2]
        sub = "zyx"
        w2 = jnp.einsum(f"vtp{sub[a]},vtp{sub[b]}->vtp{sub[a]}{sub[b]}",
                        ws[a], ws[b])
        acc = jnp.einsum(
            f"vtp{sub[a]}{sub[b]},vtzyxc->vtp{sub[keep]}c",
            w2, bricks, precision=hp)                 # (NV, T, P, dkeep, C)
        out_s = jnp.einsum(f"vtp{sub[keep]},vtp{sub[keep]}c->vtpc",
                           ws[keep], acc)             # (NV, T, P, C)
        parts.append(out_s.reshape(NV, T, rpt, m, C))
        if return_violations:
            rel_s = seg_of(relevant, s)
            bad = (badz | bady | badx) & rel_s
            bad_total = bad_total + jnp.sum(bad.astype(jnp.int32))

    out = jnp.concatenate(parts, axis=3).reshape(NV, RN, SN, C)
    if c_out is not None:
        out = out[..., :c_out]
    if return_violations:
        return out, bad_total
    return out


def brick_sample_3d_packed(
    packed: jnp.ndarray,                 # (NV, D, H, W, 8*C)
    grid: jnp.ndarray,                   # (NV, ..., 3) normalized (x, y, z)
    seg: jnp.ndarray,                    # (...,) int32 ray-slab index
    brick_dims,                          # static per-seg dims | one triple
    origins: jnp.ndarray,                # (T, S, NV, 3) planner hull minima
    n_seg: int = 8,
    align_corners: bool = True,
    padding_mode: str = "zeros",
    return_violations: bool = False,
    c_out: int = None,
):
    """build_bricks + brick_lookup in one call (tests / single-pass use).

    Production (uforecon.render_chunk) calls the two halves separately so
    one build serves both the coarse and the fine pass.
    """
    flat = build_bricks(packed, origins, brick_dims, n_seg=n_seg)
    return brick_lookup(
        flat, origins, packed.shape[1:4], brick_dims, grid, seg,
        n_seg=n_seg, align_corners=align_corners, padding_mode=padding_mode,
        return_violations=return_violations, c_out=c_out)


def ray_segments(z_val: jnp.ndarray, near: jnp.ndarray, far: jnp.ndarray,
                 n_seg: int) -> jnp.ndarray:
    """Uniform-t slab index per sample: (RN, SN) int32 in [0, n_seg).

    The slab surfaces t = near + k/S (far - near) are reference-camera
    z-planes under the per-ray z-depth convention (near_i = near0 / cam_dz),
    so each (tile x slab) cell is an exact convex polytope — the geometry
    ops/brick_plan.py bounds. Coarse and importance samples bin by the same
    rule.
    """
    u = (z_val - near[:, None]) / jnp.maximum(far - near, 1e-12)[:, None]
    return jnp.clip((u * n_seg).astype(jnp.int32), 0, n_seg - 1)
