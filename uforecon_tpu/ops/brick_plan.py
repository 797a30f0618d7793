"""Host-side planning for tile-local volume sampling (ops/brick_gather.py).

The brick sampler is bit-identical to the flat packed sampler only if its
static (BD, BH, BW) dims cover every (ray-tile x along-ray-segment) cell's
footprint in every view's volume. This module computes guaranteed covering
dims from the exact projective geometry, entirely in numpy before jit, and
— because some cells are irreducibly huge (tiles near another view's
epipole sweep entire epipolar lines) — FLAGS the tiles whose cells exceed
the chosen dims so the renderer can route just those through the flat path.

Geometry: with the per-ray z-depth convention (t bounds = scene near/far
divided by the camera-frame ray z, code1/model.py:423-427), the surfaces
t(u,v) = tn(u,v) + k/S (tf - tn)(u,v) are reference-camera z-planes, so
each cell is a convex frustum slab whose vertices are exactly the 4 tile
corner rays at the 2 bounding surfaces. A projective map with positive
denominator maps a convex hull into the hull of the vertex images, so
per-axis voxel bounds of those 8 points bound ALL points of the cell. Cells
with any nonpositive-depth vertex cannot be certified -> tile flagged to
the flat path. (For constant per-ray t bounds the slab surfaces are
spheres; the corner hull under-covers by the sagitta — sub-voxel at tile
sizes here — which ``margin`` absorbs; tests assert zero violations.)

Zero-interpolation-weight points (outside one voxel beyond the volume) are
excluded from coverage on purpose — the sampler gathers arbitrary rows for
them and multiplies by exactly zero — so the per-axis bounds are clipped to
the relevant range (-1, size) before flooring, keeping bricks tight for
cells that project partially outside a view.

Reference workload: the per-point volume sampling of model.py:350-390.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import numpy as np

_EPS_DEPTH = 1e-6


class BrickPlan(NamedTuple):
    """Static dims + per-tile origins/certification for one scene's render."""

    # stage -> per-segment ((BD, BH, BW), ... n_seg entries). Per segment
    # because footprints shrink strongly with depth (parallax): one
    # max-over-segs size was measured to overfetch ~5x in slice bytes.
    dims: Dict[str, Tuple[Tuple[int, int, int], ...]]
    flags: Dict[str, np.ndarray]            # stage -> (n_tiles,) bool
    # stage -> (n_tiles, n_seg, NV, 3) int32 brick origins (z, y, x), the
    # clipped hull minima — data inputs to the render program, so bricks are
    # built ONCE per chunk and shared by the coarse and fine passes
    origins: Dict[str, np.ndarray]
    n_seg: int
    tile: int

    def signature(self):
        """Hashable piece that changes the compiled program."""
        return (tuple(sorted(self.dims.items())), self.n_seg, self.tile)


def tile_order(h: int, w: int, tile: int) -> Tuple[np.ndarray, np.ndarray]:
    """Permutation mapping scanline ray order -> tile-major order.

    Returns (perm, inv): rays_tiled = rays[perm]; out = out_tiled[inv].
    Requires h % tile == 0 and w % tile == 0 (reference eval resolutions
    800x640, 768x576, 960x544 all satisfy tile=32).
    """
    assert h % tile == 0 and w % tile == 0, (h, w, tile)
    idx = np.arange(h * w, dtype=np.int64).reshape(h, w)
    idx = idx.reshape(h // tile, tile, w // tile, tile).transpose(0, 2, 1, 3)
    perm = idx.reshape(-1)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int64)
    return perm, inv


def _tile_corner_rays(ray_d_img, t_near_img, t_far_img, tile):
    """(nt, 4, 3) corner ray dirs + (nt, 4) per-corner t bounds."""
    h, w, _ = ray_d_img.shape
    cy = np.array([0, 0, tile - 1, tile - 1])
    cx = np.array([0, tile - 1, 0, tile - 1])
    ty, tx = np.meshgrid(np.arange(h // tile), np.arange(w // tile),
                         indexing="ij")
    yy = (ty.reshape(-1, 1) * tile + cy[None]).reshape(-1)
    xx = (tx.reshape(-1, 1) * tile + cx[None]).reshape(-1)
    d = ray_d_img[yy, xx].reshape(-1, 4, 3)
    tn = np.broadcast_to(t_near_img, (h, w))[yy, xx].reshape(-1, 4)
    tf = np.broadcast_to(t_far_img, (h, w))[yy, xx].reshape(-1, 4)
    return d, tn, tf


def _quantize(v: int, q: int, cap: int) -> int:
    return int(min(-(-v // q) * q, cap))


def plan_volume_bricks(
    poses: np.ndarray,            # (NV, 4, 4) NDC projection matrices
    near: float,                  # scene near (vz normalization)
    far: float,
    ray_o: np.ndarray,            # (3,)
    ray_d_img: np.ndarray,        # (H, W, 3)
    t_near_img: np.ndarray,       # (H, W) or scalar per-ray sample-t bounds
    t_far_img: np.ndarray,
    tile: int,
    stage_shapes: Dict[str, Tuple[int, int, int]],  # stage -> (D, h_s, w_s)
    n_seg: int = 8,
    margin: int = 2,
    row_budget: int = 1 << 16,
    min_coverage: float = 0.5,
    point_num: Optional[int] = None,
) -> Optional[BrickPlan]:
    """Covering dims + per-tile flags per stage, or None when not worth it.

    Dims are chosen per (stage, segment) as a quantized per-tile quantile,
    picking the quantile that maximizes tile coverage subject to
    ``row_budget`` (total brick rows per tile across segments — the slice
    overfetch bound); tiles any of whose cells exceed their segment's dims
    (or cannot be certified) are flagged False. Returns None when no stage
    reaches ``min_coverage`` — the renderer then keeps today's flat path
    with zero overhead.

    ``point_num`` is the coarse sampler's SN. The production sampler
    (ops/sampling.py sample_coarse, mirroring the reference
    sampler.py:33-41) jitters linspace(0, 1, SN) by +-0.5/(SN-1), so the
    static sample-index block s = [s*m, (s+1)*m) (m = SN/S) has t support
    [(s*m - 0.5), ((s+1)*m - 0.5)] / (SN - 1) — NOT the nominal slab
    [s/S, (s+1)/S]. Each cell's bounding surfaces are widened to the UNION
    of both (the union also keeps ray_segments-binned consumers covered),
    so the covering-dims certificate holds for the real jitter
    distribution, including the end blocks' overhang past near/far.
    """
    poses = np.asarray(poses, np.float64)
    ray_o = np.asarray(ray_o, np.float64)
    d, tn, tf = _tile_corner_rays(
        np.asarray(ray_d_img, np.float64),
        np.asarray(t_near_img, np.float64),
        np.asarray(t_far_img, np.float64), tile)
    nt = d.shape[0]

    # slab surfaces in t fraction. With point_num: widen to the union of the
    # nominal k/S surfaces and the jittered sample-block support boundaries
    # (k*m - 0.5)/(SN - 1); cell k is bounded below by surface k's lower
    # candidate and above by surface k+1's upper candidate. All candidates
    # are reference-camera z-planes, so hull certification is unaffected.
    frac = np.arange(n_seg + 1, dtype=np.float64) / n_seg
    if point_num is not None and point_num > 1:
        assert point_num % n_seg == 0, (point_num, n_seg)
        m = point_num // n_seg
        ext = (np.arange(n_seg + 1, dtype=np.float64) * m - 0.5) \
            / (point_num - 1)
        frac_lo = np.minimum(frac, ext)
        frac_hi = np.maximum(frac, ext)
    else:
        frac_lo = frac_hi = frac

    # cell vertices: corner rays at the S+1 lo/hi surface pairs
    # -> (nt, 4, S+1, 2, 3); cell k spans [lo surface k, hi surface k+1]
    fr2 = np.stack([frac_lo, frac_hi], -1)                 # (S+1, 2)
    tb = tn[..., None, None] + (tf - tn)[..., None, None] * fr2
    X = ray_o + tb[..., None] * d[:, :, None, None, :]
    X1 = np.concatenate([X, np.ones_like(X[..., :1])], -1)

    nv = poses.shape[0]
    dims: Dict[str, Tuple[Tuple[int, int, int], ...]] = {}
    flags: Dict[str, np.ndarray] = {}
    origins: Dict[str, np.ndarray] = {}
    any_ok = False
    for stage, (D, hs, ws) in stage_shapes.items():
        # per (tile, seg, view): clipped hull lo + extents, + certification
        lo_all = np.zeros((nt, n_seg, nv, 3), np.int64)
        ext = np.ones((nt, n_seg, 3), np.int64)
        cert = np.ones((nt, n_seg), bool)
        for v in range(nv):
            pr = X1 @ poses[v].T                       # (nt, 4, S+1, 2, 4)
            pz = pr[..., 2]
            # cell k uses lo surface k and hi surface k+1, all 4 corner rays
            czs = np.stack([pz[:, :, :-1, 0], pz[:, :, 1:, 1]], -1)
            ok = np.all(czs > _EPS_DEPTH, axis=(1, 3))         # (nt, S)
            cert &= ok
            with np.errstate(divide="ignore", invalid="ignore"):
                vx = (pr[..., 0] / pz + 1.0) * 0.5 * (ws - 1)
                vy = (pr[..., 1] / pz + 1.0) * 0.5 * (hs - 1)
                vz = (pz - near) / (far - near) * max(D - 1, 1)

            def cell_lo_ext(vc, size):
                c = np.stack([vc[:, :, :-1, 0], vc[:, :, 1:, 1]], -1)
                vmin = np.nan_to_num(c.min(axis=(1, 3)), nan=0.0,
                                     posinf=size, neginf=0.0)
                vmax = np.nan_to_num(c.max(axis=(1, 3)), nan=0.0,
                                     posinf=size, neginf=0.0)
                lo = np.clip(np.floor(np.maximum(vmin, -1.0)), 0, size - 1)
                hi = np.clip(np.floor(np.minimum(vmax, size)), 0, size - 1)
                return lo.astype(np.int64), \
                    np.maximum(hi - lo + 1, 1).astype(np.int64)

            loz, ez = cell_lo_ext(vz, D)
            loy, ey = cell_lo_ext(vy, hs)
            lox, ex = cell_lo_ext(vx, ws)
            lo_all[:, :, v] = np.stack([loz, loy, lox], -1)
            e = np.stack([ez, ey, ex], -1)                 # (nt, S, 3)
            ext = np.maximum(ext, np.where(ok[..., None], e, 1))

        # a full-size axis needs no margin: the brick then spans the whole
        # volume along it (origin clamps to 0), which always covers
        per_cell = np.minimum(ext + margin,
                              np.array([D, hs, ws]))       # (nt, S, 3)
        per_tile_cert = cert.all(axis=1)                   # (nt,)

        best = None
        for q in (100, 90, 75, 50):
            cand = np.percentile(per_cell, q, axis=0)      # (S, 3)
            dk = [(_quantize(int(c[0]), 2, D), _quantize(int(c[1]), 4, hs),
                   _quantize(int(c[2]), 8, ws)) for c in cand]
            rows = sum(a * b * c for a, b, c in dk)
            if rows > row_budget:
                continue
            lim = np.array(dk)                             # (S, 3)
            fits = per_tile_cert & np.all(per_cell <= lim, axis=(1, 2))
            cov = float(fits.mean())
            if best is None or cov > best[0]:
                best = (cov, tuple(dk), fits)
        if best is None or best[0] < min_coverage:
            # stage never bricks; renderer's flat path handles it
            dims[stage] = ((1, 1, 1),) * n_seg
            flags[stage] = np.zeros(nt, bool)
            origins[stage] = np.zeros((nt, n_seg, nv, 3), np.int32)
            continue
        any_ok = True
        dims[stage] = best[1]
        flags[stage] = best[2]
        # origins sit one voxel BELOW the f64 hull minima: the sampler's f32
        # projection can floor a boundary point one voxel lower (margin
        # covers one voxel each side); clamp so the static brick stays in
        # bounds
        dk = np.array(best[1])                             # (S, 3)
        cap = np.array([D, hs, ws]) - dk                   # (S, 3)
        origins[stage] = np.clip(
            lo_all - 1, 0, cap[None, :, None, :]).astype(np.int32)
    if not any_ok:
        return None
    return BrickPlan(dims=dims, flags=flags, origins=origins,
                     n_seg=n_seg, tile=tile)
