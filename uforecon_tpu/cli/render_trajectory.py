"""Turntable trajectory rendering CLI (reference render_trajectory_dtu.py)."""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("render_trajectory")
    p.add_argument("--out_dir", type=str, required=True,
                   help="output dir holding mesh/{scan}.ply (or mesh/final)")
    p.add_argument("--root_dir", type=str, required=True,
                   help="DTU test root with cameras/*.txt")
    p.add_argument("--test_scan", type=str, required=True)
    p.add_argument("--test_ref_view", type=int, nargs="+", default=[23, 24, 33])
    p.add_argument("--n_frames", type=int, default=240)
    p.add_argument("--img_wh", type=int, nargs=2, default=[800, 600])
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--video", type=str, default="",
                   help="output video path (default {out_dir}/video/{scan}.mp4)")
    a = p.parse_args(argv)

    from ..data import io
    from ..postproc.trajectory import render_trajectory

    mesh_path = None
    for cand in (os.path.join(a.out_dir, "mesh", "final", f"{a.test_scan}.ply"),
                 os.path.join(a.out_dir, "mesh", f"{a.test_scan}.ply")):
        if os.path.exists(cand):
            mesh_path = cand
            break
    assert mesh_path, f"no mesh for {a.test_scan} under {a.out_dir}/mesh"
    verts, faces, colors = io.read_ply(mesh_path)

    w2cs, K = [], None
    sx = a.img_wh[0] / 1600.0
    sy = a.img_wh[1] / 1200.0
    for vid in a.test_ref_view:
        cam = io.read_cam_file(os.path.join(a.root_dir, "cameras",
                                            f"{vid:08d}_cam.txt"))
        w2cs.append(cam["extrinsic"])
        K = cam["intrinsic"].copy()
        K[0] *= sx
        K[1] *= sy

    video = a.video or os.path.join(a.out_dir, "video", f"{a.test_scan}.mp4")
    render_trajectory(verts, faces, w2cs, K, wh=tuple(a.img_wh),
                      n_frames=a.n_frames, out_path=video, colors=colors,
                      fps=a.fps)
    print(f"wrote {video} ({a.n_frames} frames)")


if __name__ == "__main__":
    main()
