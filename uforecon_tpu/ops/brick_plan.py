"""Host-side planning of covering brick dims for tile-local volume sampling.

``brick_sample_3d_packed`` (ops/brick_gather.py) is bit-identical to the
flat packed sampler only if the static (BH, BW) brick dims cover every
(ray-tile x z-segment)'s true xy footprint in every view's volume. This
module computes guaranteed covering dims from the exact projective geometry,
entirely in numpy before jit:

The world-space cell of one (tile, z-segment) is the intersection of the
tile's ray frustum (a convex polytope: rays are projective in pixel coords,
per-ray near/far endpoints lie on planes) with a vz slab (two half-spaces:
vz is affine in world position). Every vertex of that convex polytope is
either a corner-ray clipped-interval endpoint or a slab-plane crossing of a
near/far-face edge — at most 24 candidate points. A projective map with
positive denominator maps a convex hull into the hull of the vertex images,
so per-axis voxel bounds of the candidates bound ALL points of the cell.
If any candidate projects to nonpositive depth in some view the hull
property fails and the planner returns None (caller falls back to flat
gathers).

Zero-interpolation-weight points (outside one voxel beyond the volume) are
excluded from coverage on purpose — the sampler gathers arbitrary rows for
them and multiplies by exactly zero — so the per-axis bounds are clipped to
the relevant range (-1, size) before flooring, keeping bricks tight for
tiles that project partially outside a view.

Reference workload: the per-point volume sampling of model.py:350-390.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

_EPS_DEPTH = 1e-6


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
    n_seg: int = 4,
    margin: int = 1,
) -> Optional[Dict[str, Tuple[int, int]]]:
    """Covering (BH, BW) per stage, or None when geometry is unsafe."""
    poses = np.asarray(poses, np.float64)
    ray_o = np.asarray(ray_o, np.float64)
    d, tn, tf = _tile_corner_rays(
        np.asarray(ray_d_img, np.float64),
        np.asarray(t_near_img, np.float64),
        np.asarray(t_far_img, np.float64), tile)
    nt = d.shape[0]
    o1 = np.concatenate([ray_o, [1.0]])
    d0 = np.concatenate([d, np.zeros((nt, 4, 1))], axis=-1)   # (nt, 4, 4)

    out: Dict[str, Tuple[int, int]] = {}
    for stage, (D, hs, ws) in stage_shapes.items():
        seg_d = -(-D // n_seg)
        # slab boundaries in voxel-z, extended one voxel past each end so
        # points with nonzero z weights just outside the grid stay covered
        vzb = np.concatenate([[-1.0],
                              np.arange(1, n_seg) * float(seg_d),
                              [float(D)]])                    # (S+1,)
        ext_y = ext_x = 1
        for v in range(poses.shape[0]):
            P3 = poses[v, 2]
            a = P3 @ o1                                       # scalar
            b = d0 @ P3                                       # (nt, 4)
            depth_b = near + vzb * (far - near) / max(D - 1, 1)  # (S+1,)

            with np.errstate(divide="ignore", invalid="ignore"):
                t_cross = (depth_b[None, None] - a) / b[..., None]
            t_cross = np.where(np.isfinite(t_cross), t_cross,
                               np.where(t_cross > 0, 1e30, -1e30))
            lo = np.minimum(t_cross[..., :-1], t_cross[..., 1:])  # (nt,4,S)
            hi = np.maximum(t_cross[..., :-1], t_cross[..., 1:])
            # b ~ 0: vz constant along the ray; cover the whole t range
            par = np.abs(b)[..., None] < 1e-12
            lo = np.where(par, -1e30, lo)
            hi = np.where(par, 1e30, hi)
            lo = np.maximum(lo, tn[..., None])
            hi = np.minimum(hi, tf[..., None])
            empty = lo > hi                                    # (nt, 4, S)
            # corner-ray candidates: (nt, 4, S, 2) ts
            ts = np.stack([lo, hi], axis=-1)
            Xr = ray_o + ts[..., None] * d[:, :, None, None, :]  # (nt,4,S,2,3)
            Xr = np.where(empty[..., None, None], np.nan, Xr)

            # face-edge candidates: near/far quads, 4 edges each
            # (corner order 0-1-3-2 walks the tile boundary)
            En = ray_o + tn[..., None] * d                     # (nt, 4, 3)
            Ef = ray_o + tf[..., None] * d
            edge_idx = np.array([[0, 1], [1, 3], [3, 2], [2, 0]])
            cand_e = []
            for quad in (En, Ef):
                A = quad[:, edge_idx[:, 0]]                    # (nt, 4, 3)
                B = quad[:, edge_idx[:, 1]]
                vzA = ((np.concatenate([A, np.ones_like(A[..., :1])], -1)
                        @ P3) - near) / (far - near) * max(D - 1, 1)
                vzB = ((np.concatenate([B, np.ones_like(B[..., :1])], -1)
                        @ P3) - near) / (far - near) * max(D - 1, 1)
                den = vzB - vzA
                with np.errstate(divide="ignore", invalid="ignore"):
                    lam = (vzb[None, None, :] - vzA[..., None]) / den[..., None]
                okc = np.isfinite(lam) & (lam >= 0.0) & (lam <= 1.0)
                Xc = A[:, :, None] + lam[..., None] * (B - A)[:, :, None]
                Xc = np.where(okc[..., None], Xc, np.nan)      # (nt,4,S+1,3)
                # boundary k belongs to segs k-1 and k
                cand_e.append(Xc[:, :, :-1])                   # seg k via lower
                cand_e.append(Xc[:, :, 1:])                    # seg k via upper
            Xe = np.stack(cand_e, axis=-2)                     # (nt,4,S,4,3)

            X = np.concatenate(
                [Xr.reshape(nt, -1, n_seg, 2, 3).transpose(0, 2, 1, 3, 4)
                 .reshape(nt, n_seg, -1, 3),
                 Xe.transpose(0, 2, 1, 3, 4).reshape(nt, n_seg, -1, 3)],
                axis=2)                                        # (nt, S, K, 3)

            X1 = np.concatenate([X, np.ones_like(X[..., :1])], -1)
            pr = X1 @ poses[v].T                               # (nt, S, K, 4)
            pz = pr[..., 2]
            live = np.isfinite(pz)
            if not np.all(pz[live] > _EPS_DEPTH):
                return None                                    # hull unsafe
            with np.errstate(invalid="ignore"):
                vx = (pr[..., 0] / pz + 1.0) * 0.5 * (ws - 1)
                vy = (pr[..., 1] / pz + 1.0) * 0.5 * (hs - 1)

            def axis_extent(vc, size):
                import warnings
                with warnings.catch_warnings():
                    # all-NaN (tile, seg) cells = no relevant points there
                    warnings.simplefilter("ignore", RuntimeWarning)
                    vmin = np.nanmin(vc, axis=-1)              # (nt, S)
                    vmax = np.nanmax(vc, axis=-1)
                none = ~np.isfinite(vmin)
                lo_i = np.clip(np.floor(np.maximum(vmin, -1.0)), 0, size - 1)
                hi_i = np.clip(np.floor(np.minimum(vmax, size)), 0, size - 1)
                ext = np.where(none, 1, hi_i - lo_i + 1)
                return int(ext.max())

            with np.errstate(invalid="ignore"):
                ext_y = max(ext_y, axis_extent(vy, hs))
                ext_x = max(ext_x, axis_extent(vx, ws))
        out[stage] = (min(ext_y + margin, hs), min(ext_x + margin, ws))
    return out
