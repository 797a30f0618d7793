#!/usr/bin/env python
"""Offscreen mesh-trajectory renderer — reference-compatible CLI.

Drop-in equivalent of the reference ``render_trajectory_open3d.py`` (its
open3d VisualizerWithKeyCallback loop, render_trajectory_open3d.py:21-51):

    python render_trajectory_open3d.py <mesh.ply> <out_dir> <cam_json_dir>

Reads open3d PinholeCameraParameters JSONs ``tmp{i}.json`` from
``cam_json_dir`` (the format the reference's render_trajectory_dtu.py writes)
and captures ``render_{i}.jpg`` per frame. open3d is absent from this
environment, so frames are ray-cast against the mesh with the native BVH
(same artifact, no GUI stack). The all-in-one path is
``render_trajectory_dtu.py`` / ``uforecon_tpu/cli/render_trajectory.py``.
"""
import json
import os
import sys
from glob import glob

import numpy as np


def read_o3d_pinhole_json(path):
    """Parse an open3d PinholeCameraParameters JSON -> (K 3x3, w2c 4x4).

    open3d stores both matrices column-major (o3d's
    PinholeCameraParameters JSON convention)."""
    with open(path) as f:
        d = json.load(f)
    intr = d["intrinsic"]
    K = np.asarray(intr["intrinsic_matrix"], np.float64).reshape(3, 3).T
    w2c = np.asarray(d["extrinsic"], np.float64).reshape(4, 4).T
    wh = (int(intr["width"]), int(intr["height"]))
    return K, w2c, wh


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 3:
        print(__doc__)
        return 1
    ply_file, out_dir, cam_dir = argv[:3]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from uforecon_tpu.data.io import read_ply
    from uforecon_tpu.postproc.raycast import RayMeshIntersector
    from uforecon_tpu.postproc.trajectory import render_mesh_frame

    verts, faces, colors = read_ply(ply_file)
    assert faces is not None and len(faces), f"{ply_file} has no faces"
    inter = RayMeshIntersector(verts, faces)
    os.makedirs(out_dir, exist_ok=True)

    cams = sorted(glob(os.path.join(cam_dir, "tmp*.json")),
                  key=lambda p: int("".join(c for c in os.path.basename(p)
                                            if c.isdigit()) or 0))
    if not cams:
        print(f"no tmp*.json camera files in {cam_dir}")
        return 1

    import cv2

    for i, cam in enumerate(cams):
        K, w2c, wh = read_o3d_pinhole_json(cam)
        frame = render_mesh_frame(inter, verts, faces, w2c, K, wh,
                                  colors=colors)
        cv2.imwrite(os.path.join(out_dir, f"render_{i}.jpg"),
                    frame[..., ::-1])
    print(f"wrote {len(cams)} frames to {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
