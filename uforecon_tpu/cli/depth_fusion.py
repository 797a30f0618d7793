"""Geometric-consistency depth fusion CLI -> point cloud ply.

Reference-compatible driver for the MVSNet-style alternative fusion path
(reference code1/utils/depth_fusion.py:93-259; fixes the broken
script/depth_fusion.sh path, SURVEY.md §2.6).
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from .tsdf_fusion import DTU_SCANS


def run_scan(out_dir: str, scan: str, n_view: int, geo_mask_thres: int,
             pix_thresh: float, depth_thresh: float) -> str:
    from ..data.io import write_ply
    from ..fusion.depth_fusion import filter_depth_maps
    from ..fusion.tsdf import load_depth_entry

    depth_dir = os.path.join(out_dir, "depth")
    entries, rgbs = [], []
    for name in range(n_view):
        e = load_depth_entry(depth_dir, scan, name)
        if e is None:
            continue
        entries.append(e)
        rgb = None
        from PIL import Image
        for cand in (f"{name:08d}.jpg", f"{name}.jpg", f"refview{name}.jpg"):
            p = os.path.join(out_dir, "rgb", scan, cand)
            if os.path.exists(p):
                rgb = np.asarray(Image.open(p))
                break
        rgbs.append(rgb)
    assert entries, f"no depth maps for {scan} under {depth_dir}"

    use_rgb = all(r is not None for r in rgbs)
    pts, cols, masks = filter_depth_maps(
        entries, geo_mask_thres=geo_mask_thres, pix_thresh=pix_thresh,
        depth_thresh=depth_thresh, rgb_images=rgbs if use_rgb else None)

    # per-view masks mirror the reference's mask dumps (depth_fusion.py:150)
    mask_dir = os.path.join(out_dir, "mask", scan)
    os.makedirs(mask_dir, exist_ok=True)
    for i, m in enumerate(masks):
        np.save(os.path.join(mask_dir, f"{i:08d}_geo.npy"), m)

    pcd_dir = os.path.join(out_dir, "pcd_fusion")
    os.makedirs(pcd_dir, exist_ok=True)
    out_path = os.path.join(pcd_dir, f"{scan}.ply")
    write_ply(out_path, pts, colors=cols)
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser("depth_fusion")
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--n_view", type=int, default=3)
    p.add_argument("--geo_mask_thres", type=int, default=2)
    p.add_argument("--pix_thresh", type=float, default=1.0)
    p.add_argument("--depth_thresh", type=float, default=0.01)
    p.add_argument("--test_scan", type=str, default="")
    a = p.parse_args(argv)

    scans = [a.test_scan] if a.test_scan else [f"scan{s}" for s in DTU_SCANS]
    for scan in scans:
        try:
            path = run_scan(a.out_dir, scan, a.n_view, a.geo_mask_thres,
                            a.pix_thresh, a.depth_thresh)
            print(f"{scan}: wrote {path}")
        except AssertionError as e:
            print(f"{scan}: skipped ({e})")


if __name__ == "__main__":
    main()
