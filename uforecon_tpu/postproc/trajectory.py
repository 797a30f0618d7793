"""Trajectory rendering: Slerp camera paths + BVH mesh rendering.

Reference parity: render_trajectory_dtu.py:57-77 (Slerp-interpolate 240
poses between the render cameras) + render_trajectory_open3d.py:21-51
(offscreen mesh rendering loop). open3d is absent from this environment, so
frames are rendered by first-hit ray casting against the mesh through the
native BVH with Lambertian shading — same artifact (a turntable video of
the reconstructed mesh), no GUI stack required.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np


def interpolate_poses(w2cs: Sequence[np.ndarray], n_frames: int = 240,
                      closed: bool = False) -> List[np.ndarray]:
    """Slerp rotations + lerp centers between consecutive cameras
    (render_trajectory_dtu.py:57-77)."""
    from scipy.spatial.transform import Rotation, Slerp

    w2cs = [np.asarray(p, np.float64) for p in w2cs]
    if closed:
        w2cs = w2cs + [w2cs[0]]
    n_seg = len(w2cs) - 1
    assert n_seg >= 1, "need at least two cameras"

    keys = Rotation.from_matrix(np.stack([p[:3, :3] for p in w2cs]))
    slerp = Slerp(np.arange(len(w2cs), dtype=np.float64), keys)
    centers = np.stack([-p[:3, :3].T @ p[:3, 3] for p in w2cs])

    out = []
    ts = np.linspace(0, n_seg, n_frames)
    for t in ts:
        R = slerp([t]).as_matrix()[0]
        i = min(int(np.floor(t)), n_seg - 1)
        a = t - i
        c = (1 - a) * centers[i] + a * centers[i + 1]
        E = np.eye(4)
        E[:3, :3] = R
        E[:3, 3] = -R @ c
        out.append(E.astype(np.float32))
    return out


def render_mesh_frame(inter, verts: np.ndarray, faces: np.ndarray,
                      w2c: np.ndarray, K: np.ndarray, wh,
                      light_dir=(0.3, -0.5, 0.8),
                      colors: Optional[np.ndarray] = None,
                      bg: float = 1.0) -> np.ndarray:
    """Ray-cast one frame: first hit -> Lambert-shaded normal (or vertex
    color) image (uint8 HxWx3)."""
    w, h = wh
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pix = np.stack([xs.ravel() + 0.5, ys.ravel() + 0.5,
                    np.ones(h * w)], axis=0)
    Ki = np.linalg.inv(np.asarray(K)[:3, :3])
    c2w = np.linalg.inv(np.asarray(w2c, np.float64))
    d = c2w[:3, :3] @ (Ki @ pix)
    d = (d / np.linalg.norm(d, axis=0)).T.astype(np.float32)
    o = np.tile(c2w[:3, 3].astype(np.float32), (h * w, 1))

    tri, _t = inter.intersects_first(o, d)
    img = np.full((h * w, 3), bg, np.float32)
    hit = tri >= 0
    if hit.any():
        f = faces[tri[hit]]
        p0, p1, p2 = verts[f[:, 0]], verts[f[:, 1]], verts[f[:, 2]]
        n = np.cross(p1 - p0, p2 - p0)
        n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
        ld = np.asarray(light_dir, np.float64)
        ld = ld / np.linalg.norm(ld)
        lam = 0.25 + 0.75 * np.abs(n @ ld)
        if colors is not None:
            base = colors[f].mean(axis=1) / 255.0
        else:
            base = np.full((hit.sum(), 3), 0.75)
        img[hit] = base * lam[:, None]
    return (np.clip(img, 0, 1).reshape(h, w, 3) * 255).astype(np.uint8)


def render_trajectory(verts: np.ndarray, faces: np.ndarray,
                      w2cs: Sequence[np.ndarray], K: np.ndarray,
                      wh=(400, 300), n_frames: int = 240,
                      out_path: Optional[str] = None,
                      colors: Optional[np.ndarray] = None,
                      fps: int = 30) -> List[np.ndarray]:
    """Render the interpolated trajectory; optionally write a video/gif."""
    from .raycast import RayMeshIntersector

    inter = RayMeshIntersector(verts, faces)
    poses = interpolate_poses(w2cs, n_frames)
    frames = [render_mesh_frame(inter, verts, faces, p, K, wh, colors=colors)
              for p in poses]
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        import imageio

        if out_path.endswith(".gif"):
            imageio.mimsave(out_path, frames, duration=1.0 / fps)
        else:
            try:
                imageio.mimsave(out_path, frames, fps=fps)
            except Exception:
                # no ffmpeg backend in this environment -> gif fallback
                gif = os.path.splitext(out_path)[0] + ".gif"
                imageio.mimsave(gif, frames, duration=1.0 / fps)
                print(f"video backend unavailable; wrote {gif} instead")
    return frames
