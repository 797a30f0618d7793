"""TSDF fusion: depth maps -> truncated signed distance volume -> mesh.

TPU-native replacement for the reference's PyCUDA/Numba fusion
(reference: tsdf_fusion.py:20-356 TSDFVolume with an inline CUDA ``integrate``
kernel at tsdf_fusion.py:77-154 and @njit(parallel) kernels at 181-218;
driver save_tsdf at tsdf_fusion.py:447-505). Semantics follow the vectorized
CPU path (tsdf_fusion.py:267-310):

    voxel -> world -> camera -> pixel; depth_diff = depth(pix) - cam_z;
    valid if depth > 0 and depth_diff >= -trunc_margin;
    dist = clip(depth_diff / trunc, max=1);
    running weighted average of tsdf (and color).

The integration is one jitted XLA program over the whole voxel grid — the
direct analogue of the CUDA one-thread-per-voxel kernel.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ..ops import camera as cam_ops
from .marching import marching_cubes


class TSDFVolume:
    """Volumetric TSDF with XLA-compiled integration."""

    def __init__(self, vol_bnds: np.ndarray, voxel_size: float,
                 margin: float = 5.0, use_color: bool = True,
                 device_backend: str = "auto"):
        vol_bnds = np.asarray(vol_bnds, np.float32)
        assert vol_bnds.shape == (3, 2)
        self.voxel_size = float(voxel_size)
        self.trunc_margin = margin * self.voxel_size

        self.vol_dim = np.ceil(
            (vol_bnds[:, 1] - vol_bnds[:, 0]) / self.voxel_size
        ).astype(int)
        vol_bnds[:, 1] = vol_bnds[:, 0] + self.vol_dim * self.voxel_size
        self.vol_bnds = vol_bnds
        self.origin = vol_bnds[:, 0].copy()
        self.use_color = use_color

        import jax
        import jax.numpy as jnp

        self._jax = jax
        dims = tuple(int(d) for d in self.vol_dim)
        self.tsdf = jnp.ones(dims, jnp.float32)
        self.weight = jnp.zeros(dims, jnp.float32)
        self.color = jnp.zeros(dims + (3,), jnp.float32) if use_color else None
        self._integrate = jax.jit(functools.partial(
            _integrate_step,
            origin=tuple(self.origin.tolist()),
            voxel_size=self.voxel_size,
            trunc=self.trunc_margin,
            use_color=use_color,
        ))

    def integrate(self, depth_im: np.ndarray, intr: np.ndarray,
                  c2w: np.ndarray, color_im: Optional[np.ndarray] = None,
                  obs_weight: float = 1.0) -> None:
        """Fuse one depth map (H, W) in the same units as voxel_size."""
        import jax.numpy as jnp

        w2c = np.linalg.inv(np.asarray(c2w, np.float32))
        if color_im is None:
            color_im = np.zeros(depth_im.shape + (3,), np.float32)
        self.tsdf, self.weight, self.color = self._integrate(
            self.tsdf, self.weight, self.color,
            jnp.asarray(depth_im, jnp.float32),
            jnp.asarray(color_im, jnp.float32),
            jnp.asarray(intr[:3, :3], jnp.float32),
            jnp.asarray(w2c, jnp.float32),
            jnp.float32(obs_weight),
        )

    # -- outputs ----------------------------------------------------------
    def get_volume(self) -> Tuple[np.ndarray, np.ndarray]:
        return np.asarray(self.tsdf), np.asarray(self.weight)

    def get_mesh(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Extract the zero iso-surface -> (verts world, faces, colors)."""
        tsdf, weight = self.get_volume()
        # ignore never-observed voxels (weight 0 keeps tsdf at +1)
        # marching cubes = reference triangulation (tsdf_fusion.py:325)
        verts, faces = marching_cubes(tsdf, level=0.0)
        verts_world = verts * self.voxel_size + self.origin
        colors = None
        if self.use_color and len(verts):
            cvol = np.asarray(self.color)
            idx = np.clip(np.round(verts).astype(int), 0,
                          np.array(self.vol_dim) - 1)
            colors = np.clip(cvol[idx[:, 0], idx[:, 1], idx[:, 2]], 0, 255
                             ).astype(np.uint8)
        return verts_world.astype(np.float32), faces, colors

    def get_point_cloud(self) -> np.ndarray:
        """Surface point cloud = mesh vertices (reference pcd output)."""
        verts, _, _ = self.get_mesh()
        return verts


def _integrate_step(tsdf, weight, color, depth_im, color_im, intr, w2c,
                    obs_weight, *, origin, voxel_size, trunc, use_color):
    import jax.numpy as jnp

    nx, ny, nz = tsdf.shape
    h, w = depth_im.shape

    xs = origin[0] + jnp.arange(nx, dtype=jnp.float32) * voxel_size
    ys = origin[1] + jnp.arange(ny, dtype=jnp.float32) * voxel_size
    zs = origin[2] + jnp.arange(nz, dtype=jnp.float32) * voxel_size

    # world -> camera, broadcast without materializing the (N,3) matrix
    R = w2c[:3, :3]
    t = w2c[:3, 3]
    cam = (
        xs[:, None, None, None] * R[None, None, None, :, 0]
        + ys[None, :, None, None] * R[None, None, None, :, 1]
        + zs[None, None, :, None] * R[None, None, None, :, 2]
        + t
    )  # (nx, ny, nz, 3)

    z = cam[..., 2]
    invalid_z = z <= 0
    px = jnp.round(intr[0, 0] * cam[..., 0] / jnp.where(invalid_z, 1.0, z)
                   + intr[0, 2]).astype(jnp.int32)
    py = jnp.round(intr[1, 1] * cam[..., 1] / jnp.where(invalid_z, 1.0, z)
                   + intr[1, 2]).astype(jnp.int32)

    inb = (~invalid_z) & (px >= 0) & (px < w) & (py >= 0) & (py < h)
    pxc = jnp.clip(px, 0, w - 1)
    pyc = jnp.clip(py, 0, h - 1)
    d = depth_im[pyc, pxc]
    depth_diff = d - z

    valid = inb & (d > 0) & (depth_diff >= -trunc)
    dist = jnp.minimum(1.0, depth_diff / trunc)

    w_old = weight
    w_new = jnp.where(valid, w_old + obs_weight, w_old)
    tsdf_new = jnp.where(
        valid,
        (w_old * tsdf + obs_weight * dist) / jnp.maximum(w_new, 1e-9),
        tsdf,
    )
    if use_color and color is not None:
        c = color_im[pyc, pxc]
        color_new = jnp.where(
            valid[..., None],
            (w_old[..., None] * color + obs_weight * c)
            / jnp.maximum(w_new, 1e-9)[..., None],
            color,
        )
    else:
        color_new = color
    return tsdf_new, w_new, color_new


# --------------------------------------------------------------------------
# Scan-level driver (reference save_tsdf, tsdf_fusion.py:447-505)
# --------------------------------------------------------------------------


def load_depth_entry(depth_dir: str, scan: str, name) -> Optional[Dict]:
    """Read {out_dir}/depth/{scan}/{name}.npy accepting both reference naming
    conventions ('refview{N}' and zero-padded ids — SURVEY.md §3.2)."""
    import os

    cands = []
    if isinstance(name, int):
        cands = [f"refview{name}.npy", f"{name:08d}.npy"]
    else:
        cands = [f"{name}.npy"]
    for c in cands:
        p = os.path.join(depth_dir, scan, c)
        if os.path.exists(p):
            return np.load(p, allow_pickle=True).item()
    return None


def fuse_scan(
    out_dir: str,
    scan: str,
    n_views: int,
    voxel_size: float = 1.5,
    margin: float = 5.0,
    depth_scale: float = 1.0,
    rgb_dir: Optional[str] = None,
    names: Optional[Sequence] = None,
) -> Dict[str, np.ndarray]:
    """Fuse all rendered depth maps of one scan and extract the mesh.

    Reads the depth-map directory layout written by pipeline/extract.py and
    returns {verts, faces, colors, tsdf_bounds}.
    """
    import os

    depth_dir = os.path.join(out_dir, "depth")
    entries = []
    view_names = names if names is not None else list(range(n_views))
    for name in view_names:
        e = load_depth_entry(depth_dir, scan, name)
        if e is not None:
            entries.append((name, e))
    assert entries, f"no depth maps found for {scan} in {depth_dir}"

    # volume bounds: union of view frusta (tsdf_fusion.py:458-475)
    bnds = np.zeros((3, 2), np.float32)
    bnds[:, 0], bnds[:, 1] = np.inf, -np.inf
    for _, e in entries:
        depth = e["depth"] * depth_scale
        intr = np.asarray(e["intrinsic"])
        c2w = np.linalg.inv(np.asarray(e["extrinsic"]))
        dmax = float(np.percentile(depth[depth > 0], 99)) if (depth > 0).any() else 1.0
        pts = cam_ops.view_frustum_points(
            max(float(depth[depth > 0].min()) if (depth > 0).any() else 0.1, 1e-3),
            dmax, depth.shape, intr, c2w,
        )
        bnds[:, 0] = np.minimum(bnds[:, 0], pts.min(axis=1))
        bnds[:, 1] = np.maximum(bnds[:, 1], pts.max(axis=1))

    vol = TSDFVolume(bnds, voxel_size, margin=margin)
    for name, e in entries:
        depth = e["depth"] * depth_scale
        intr = np.asarray(e["intrinsic"])
        c2w = np.linalg.inv(np.asarray(e["extrinsic"]))
        color = None
        if rgb_dir is not None:
            from PIL import Image
            import os as _os

            for cand in (f"{name}.jpg", f"refview{name}.jpg"):
                p = _os.path.join(rgb_dir, scan, cand)
                if _os.path.exists(p):
                    color = np.asarray(Image.open(p), np.float32)
                    break
        vol.integrate(depth, intr, c2w, color_im=color)

    verts, faces, colors = vol.get_mesh()
    return {"verts": verts, "faces": faces, "colors": colors,
            "bounds": vol.vol_bnds}
