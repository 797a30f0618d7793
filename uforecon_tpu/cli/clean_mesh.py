"""Mesh cleaning CLI: {out_dir}/mesh/{scan}.ply -> {out_dir}/mesh/final/scan{N}.ply.

Reference-compatible driver (reference evaluation/clean_mesh.py:282-328):
loads each scan's fused mesh, the per-view object masks from the DTU test
root ({scan}/mask/{vid:03d}.png), and the view cameras; applies the
mask-visibility and frustum ray-cast filters. Views without mask files fall
back to full-frame masks (filters then only remove out-of-frustum faces).
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from .tsdf_fusion import DTU_SCANS


def _load_view_data(root_dir: str, scan: str, view_ids, img_wh):
    from PIL import Image

    from ..data import io

    masks, intrs, w2cs = [], [], []
    sx = img_wh[0] / 1600.0
    sy = img_wh[1] / 1200.0
    for vid in view_ids:
        cam = io.read_cam_file(
            os.path.join(root_dir, "cameras", f"{vid:08d}_cam.txt"))
        K = cam["intrinsic"].copy()
        K[0] *= sx
        K[1] *= sy
        intrs.append(K)
        w2cs.append(cam["extrinsic"])

        mask = None
        for cand in (f"{vid:03d}.png", f"{vid:08d}.png", f"{vid:06d}.png"):
            p = os.path.join(root_dir, scan, "mask", cand)
            if os.path.exists(p):
                m = np.asarray(Image.open(p).convert("L").resize(
                    tuple(img_wh), Image.NEAREST))
                mask = m > 127
                break
        if mask is None:
            mask = np.ones((img_wh[1], img_wh[0]), bool)
        masks.append(mask)
    return masks, intrs, w2cs


def run_scan(out_dir: str, root_dir: str, scan: str, view_ids,
             img_wh=(800, 640), minimal_vis: int = 1,
             min_component_faces: int = 500, ray_stride: int = 1) -> str:
    from ..data.io import read_ply, write_ply
    from ..postproc.clean_mesh import clean_mesh

    mesh_path = os.path.join(out_dir, "mesh", f"{scan}.ply")
    assert os.path.exists(mesh_path), f"missing {mesh_path}"
    verts, faces, _ = read_ply(mesh_path)
    assert faces is not None and len(faces), f"{mesh_path} has no faces"

    masks, intrs, w2cs = _load_view_data(root_dir, scan, view_ids, list(img_wh))
    v2, f2 = clean_mesh(verts, faces, masks, intrs, w2cs,
                        minimal_vis=minimal_vis,
                        min_component_faces=min_component_faces,
                        ray_stride=ray_stride)

    final_dir = os.path.join(out_dir, "mesh", "final")
    os.makedirs(final_dir, exist_ok=True)
    out_path = os.path.join(final_dir, f"{scan}.ply")
    write_ply(out_path, v2, faces=f2)
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser("clean_mesh")
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--root_dir", type=str, required=True,
                   help="DTU test root (cameras/ + {scan}/mask/)")
    p.add_argument("--n_view", type=int, default=3)
    p.add_argument("--test_ref_view", type=int, nargs="+",
                   default=[1, 16, 36])
    p.add_argument("--img_wh", type=int, nargs=2, default=[800, 640])
    p.add_argument("--minimal_vis", type=int, default=1)
    p.add_argument("--min_component_faces", type=int, default=500)
    p.add_argument("--ray_stride", type=int, default=1,
                   help=">1 subsamples frustum rays for speed")
    p.add_argument("--test_scan", type=str, default="")
    a = p.parse_args(argv)

    scans = [a.test_scan] if a.test_scan else [f"scan{s}" for s in DTU_SCANS]
    views = a.test_ref_view[: a.n_view]
    for scan in scans:
        try:
            path = run_scan(a.out_dir, a.root_dir, scan, views,
                            img_wh=tuple(a.img_wh), minimal_vis=a.minimal_vis,
                            min_component_faces=a.min_component_faces,
                            ray_stride=a.ray_stride)
            print(f"{scan}: wrote {path}")
        except AssertionError as e:
            print(f"{scan}: skipped ({e})")


if __name__ == "__main__":
    main()
