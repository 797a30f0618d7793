"""DTU chamfer-distance evaluation.

Host-side rewrite of the reference evaluator
(reference: evaluation/dtu_eval.py:31-193). Protocol (identical scoring
math; BASELINE.md "chamfer scoring params"):

  1. densify the mesh by triangle-area-proportional surface sampling so
     sample spacing <= downsample density (reference sample_single_tri via
     mp.Pool, dtu_eval.py:12-21,87-91 — vectorized numpy here);
  2. radius-downsample at 0.2 mm using a KD-tree (dtu_eval.py:107-115);
  3. crop to the scan's ObsMask (+patch margin 60, dtu_eval.py:119-131);
  4. accuracy  d2s = mean NN distance (clipped at max_dist=20) data->GT;
     completeness s2d = mean NN distance GT->data, restricted above the
     ground plane Plane{scan}.mat (dtu_eval.py:147-155);
  5. overall = (d2s + s2d) / 2.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

DTU_EVAL_SCANS = [24, 37, 40, 55, 63, 65, 69, 83, 97, 105, 106, 110, 114, 118, 122]


def sample_mesh_surface(verts: np.ndarray, faces: np.ndarray,
                        density: float) -> np.ndarray:
    """Densify a mesh: keep vertices + add grid samples inside big triangles.

    Follows the reference's per-triangle sampling count
    n = 1 + max(side1, side2) / density per edge direction
    (dtu_eval.py:12-21,64-91), vectorized over all triangles.
    """
    if len(faces) == 0:
        return verts.astype(np.float32)
    tri = verts[faces].astype(np.float64)  # (M, 3, 3)
    v1 = tri[:, 1] - tri[:, 0]
    v2 = tri[:, 2] - tri[:, 0]
    l1 = np.linalg.norm(v1, axis=1)
    l2 = np.linalg.norm(v2, axis=1)

    n1 = np.clip(np.ceil(l1 / density).astype(int) + 1, 1, None)
    n2 = np.clip(np.ceil(l2 / density).astype(int) + 1, 1, None)

    out = [verts.astype(np.float32)]
    # group triangles by (n1, n2) so each group samples on one grid
    key = n1 * 10_000 + n2
    for k in np.unique(key):
        sel = key == k
        kn1 = int(n1[sel][0])
        kn2 = int(n2[sel][0])
        if kn1 * kn2 <= 4:
            continue
        u = np.linspace(0, 1, kn1)
        v = np.linspace(0, 1, kn2)
        uu, vv = np.meshgrid(u, v, indexing="ij")
        inside = (uu + vv) <= 1.0
        uu, vv = uu[inside], vv[inside]
        pts = (
            tri[sel][:, None, 0]
            + uu[None, :, None] * v1[sel][:, None]
            + vv[None, :, None] * v2[sel][:, None]
        ).reshape(-1, 3)
        out.append(pts.astype(np.float32))
    return np.concatenate(out, axis=0)


def radius_downsample(points: np.ndarray, radius: float) -> np.ndarray:
    """Greedy radius downsampling via KD-tree (dtu_eval.py:107-115 semantics:
    keep a point if no already-kept point lies within `radius`)."""
    from scipy.spatial import cKDTree

    # grid-hash approximation first to bound the candidate set
    tree = cKDTree(points)
    n = len(points)
    keep = np.ones(n, bool)
    # reference implementation: for each point in order, drop all its
    # unprocessed neighbours within radius
    pairs = tree.query_ball_point(points, r=radius, workers=-1)
    processed = np.zeros(n, bool)
    for i in range(n):
        if processed[i]:
            continue
        nbrs = pairs[i]
        keep_i = keep[i]
        for j in nbrs:
            if j != i and not processed[j]:
                keep[j] = False
                processed[j] = True
        processed[i] = True
    return points[keep]


def load_obs_mask(mask_path: str):
    """Load ObsMask{scan}_10.mat -> (BB (2,3), ObsMask bool grid, Res)."""
    from scipy.io import loadmat

    m = loadmat(mask_path)
    return m["BB"].astype(np.float64), m["ObsMask"], float(m["Res"][0][0])


def eval_scan(
    data_points: np.ndarray,
    gt_points: np.ndarray,
    obs_mask: Optional[Tuple[np.ndarray, np.ndarray, float]] = None,
    ground_plane: Optional[np.ndarray] = None,
    max_dist: float = 20.0,
    patch: float = 60.0,
) -> Dict[str, float]:
    """Chamfer scores for one scan (already densified/downsampled points)."""
    from scipy.spatial import cKDTree

    data = np.asarray(data_points, np.float64)
    gt = np.asarray(gt_points, np.float64)

    if obs_mask is not None:
        BB, mask_grid, res = obs_mask
        # crop data points to the observability mask (+patch margin)
        inb = np.all((data >= BB[0] - patch) & (data <= BB[1] + patch), axis=1)
        data_in = data[inb]
        grid_idx = np.floor((data_in - BB[0]) / res).astype(int)
        shape = np.array(mask_grid.shape)
        ok = np.all((grid_idx >= 0) & (grid_idx < shape), axis=1)
        sel = np.zeros(len(data_in), bool)
        g = grid_idx[ok]
        sel[ok] = mask_grid[g[:, 0], g[:, 1], g[:, 2]] > 0
        data = data_in[sel]

    if len(data) == 0:
        return {"acc": float("nan"), "comp": float("nan"), "overall": float("nan")}

    gt_tree = cKDTree(gt)
    d2s = gt_tree.query(data, k=1, workers=-1)[0]
    d2s = np.minimum(d2s, max_dist)
    acc = float(d2s.mean())

    gt_eval = gt
    if ground_plane is not None:
        # keep GT points above the ground plane (dtu_eval.py:147-155)
        p = np.asarray(ground_plane).reshape(-1)
        above = gt @ p[:3] + p[3] > 0
        gt_eval = gt[above]
    data_tree = cKDTree(data)
    s2d = data_tree.query(gt_eval, k=1, workers=-1)[0]
    s2d = np.minimum(s2d, max_dist)
    comp = float(s2d.mean())

    return {"acc": acc, "comp": comp, "overall": (acc + comp) / 2.0}


def eval_mesh_against_dtu(
    mesh_path: str,
    scan: int,
    dataset_dir: str,
    downsample_density: float = 0.2,
    max_dist: float = 20.0,
    patch: float = 60.0,
) -> Dict[str, float]:
    """Full protocol for one scan given the DTU SampleSet layout
    (Points/stl/stl{scan:03}_total.ply + ObsMask/Plane .mat files)."""
    from ..data.io import read_ply

    verts, faces, _ = read_ply(mesh_path)
    pts = sample_mesh_surface(verts, faces if faces is not None else np.zeros((0, 3), int),
                              downsample_density)
    pts = radius_downsample(pts, downsample_density)

    gt_path = os.path.join(dataset_dir, "Points", "stl", f"stl{scan:03d}_total.ply")
    gt, _, _ = read_ply(gt_path)

    obs = None
    plane = None
    mask_path = os.path.join(dataset_dir, "ObsMask", f"ObsMask{scan}_10.mat")
    if os.path.exists(mask_path):
        obs = load_obs_mask(mask_path)
    plane_path = os.path.join(dataset_dir, "ObsMask", f"Plane{scan}.mat")
    if os.path.exists(plane_path):
        from scipy.io import loadmat

        plane = loadmat(plane_path)["P"]
    return eval_scan(pts, gt, obs_mask=obs, ground_plane=plane,
                     max_dist=max_dist, patch=patch)
