"""TSDF fusion CLI: depth-map directory -> mesh/{scan}.ply + pcd/{scan}.ply.

Reference-compatible driver (reference tsdf_fusion.py:447-534 save_tsdf +
__main__): per scan, fuse the rendered depth maps into a TSDF volume,
extract the iso-surface, write mesh and point cloud.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

DTU_SCANS = [24, 37, 40, 55, 63, 65, 69, 83, 97, 105, 106, 110, 114, 118, 122]


def run_scan(out_dir: str, scan: str, n_view: int, voxel_size: float,
             margin: float, depth_scale: float = 1.0) -> str:
    from ..data.io import write_ply
    from ..fusion.tsdf import fuse_scan

    res = fuse_scan(out_dir, scan, n_view, voxel_size=voxel_size,
                    margin=margin, depth_scale=depth_scale,
                    rgb_dir=os.path.join(out_dir, "rgb"))
    mesh_dir = os.path.join(out_dir, "mesh")
    pcd_dir = os.path.join(out_dir, "pcd")
    os.makedirs(mesh_dir, exist_ok=True)
    os.makedirs(pcd_dir, exist_ok=True)
    mesh_path = os.path.join(mesh_dir, f"{scan}.ply")
    write_ply(mesh_path, res["verts"], faces=res["faces"],
              colors=res["colors"])
    write_ply(os.path.join(pcd_dir, f"{scan}.ply"), res["verts"],
              colors=res["colors"])
    return mesh_path


def main(argv=None):
    p = argparse.ArgumentParser("tsdf_fusion")
    p.add_argument("--out_dir", type=str, required=True,
                   help="directory holding depth/{scan}/*.npy")
    p.add_argument("--n_view", type=int, default=3)
    p.add_argument("--voxel_size", type=float, default=1.5)
    p.add_argument("--margin", type=float, default=5.0)
    p.add_argument("--depth_scale", type=float, default=1.0)
    p.add_argument("--dataset", type=str, default="dtu")
    p.add_argument("--test_scan", type=str, default="",
                   help="single scan name; default: the 15-scan DTU list")
    a = p.parse_args(argv)

    scans = [a.test_scan] if a.test_scan else [f"scan{s}" for s in DTU_SCANS]
    for scan in scans:
        try:
            path = run_scan(a.out_dir, scan, a.n_view, a.voxel_size, a.margin,
                            a.depth_scale)
            print(f"{scan}: wrote {path}")
        except AssertionError as e:
            print(f"{scan}: skipped ({e})")


if __name__ == "__main__":
    main()
