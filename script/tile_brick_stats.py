"""Tile-DMA feasibility statistics for the correlation-volume gathers.

VERDICT r2 item 2: the dominant render cost (7.96 s/image) is 589.8M
scattered one-row gathers from the multi-GB corner-packed correlation
volumes at the measured HBM-regime rate (~74M rows/s = ~10.6 GB/s effective
— 1.3% of v5e HBM bandwidth). The untried escape is VMEM locality: render
rays in 2D image tiles, bulk-DMA each view's frustum sub-brick for the tile
into VMEM (or at least into a small cache-resident source), sample there.

This script computes the GEOMETRY side of that trade on the exact bench
workload (800x640, 64+64 samples, 3 views, synthetic DTU-like cameras from
__graft_entry__._tiny_scene): for every (ray tile x z-segment x view x
stage) it bounds the voxel sub-brick that covers all trilinear corners
(projection along a ray is a monotone Mobius map in z, so the union over a
z-segment is bounded by its endpoint projections), then reports

  * brick-dim distributions (p50 / p95 / max) per stage,
  * total DMA bytes/image vs total gather-row bytes/image,
  * projected time each way from the measured rates (gather 13.5 ns/row;
    DMA at the ~700 GB/s bulk-copy regime),

i.e. the "brick bytes/tile vs rows saved" numbers BASELINE.md needs either
to justify building the kernel or to record the dead end.

Pure host-side numpy — no TPU required.

Reference workload being accelerated: per-point trilinear sampling of the
three cascade stage volumes, /root/reference/code1/model.py:350-390.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=640)
    ap.add_argument("--w", type=int, default=800)
    ap.add_argument("--tile", type=int, default=32, help="ray tile side (px)")
    ap.add_argument("--zseg", type=int, default=16, help="samples per z segment")
    ap.add_argument("--coarse", type=int, default=64)
    ap.add_argument("--fine", type=int, default=64)
    ap.add_argument("--views", type=int, default=3)
    ap.add_argument("--pack_ch", type=int, default=72, help="corner-packed channels")
    ap.add_argument("--dtype_bytes", type=int, default=2, help="bf16 volume storage")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from __graft_entry__ import _tiny_scene

    scene, ray_d = _tiny_scene(n_views=args.views, h=args.h, w=args.w,
                               ndepth=192)
    poses = np.asarray(scene.source_poses)          # (NV, 4, 4) NDC proj
    ray_o = np.asarray(scene.ray_o)                 # (3,)
    near, far = float(scene.near), float(scene.far)
    ray_d = np.asarray(ray_d).reshape(args.h, args.w, 3)

    # stage volume spatial dims (D, h, w) at the bench cascade config
    stages = {
        "stage1": (48, args.h // 4, args.w // 4),
        "stage2": (32, args.h // 2, args.w // 2),
        "stage3": (8, args.h, args.w),
    }

    nt_y, nt_x = args.h // args.tile, args.w // args.tile
    sn = args.coarse  # coarse pass; fine pass band statistics reported via z spread
    n_seg = sn // args.zseg
    z_edges = near + (far - near) * np.arange(n_seg + 1) / n_seg  # coarse strata

    bytes_per_vox = args.pack_ch * args.dtype_bytes
    rows_per_point = args.views * len(stages)

    stats = {s: [] for s in stages}
    total_dma_bytes = 0
    clipped = 0

    for ty in range(nt_y):
        for tx in range(nt_x):
            rd = ray_d[ty * args.tile:(ty + 1) * args.tile,
                       tx * args.tile:(tx + 1) * args.tile].reshape(-1, 3)
            for si in range(n_seg):
                # endpoints bound the segment union (monotone in z)
                pts = (ray_o[None, None] +
                       rd[None, :, :] * np.array([[z_edges[si]],
                                                  [z_edges[si + 1]]])[..., None])
                pts = pts.reshape(-1, 3)                       # (2*T^2, 3)
                hom = np.concatenate([pts, np.ones_like(pts[:, :1])], -1)
                for v in range(args.views):
                    pr = hom @ poses[v].T                      # (P, 4)
                    z = pr[:, 2]
                    xy = pr[:, :2] / np.where(z == 0, 1e-8, z)[:, None]
                    # volume z coord: depth normalized to [-1,1] by near/far
                    zn = (z - near) / (far - near) * 2 - 1
                    for s, (D, sh, sw) in stages.items():
                        # align_corners=True voxel coords
                        vx = (xy[:, 0] + 1) / 2 * (sw - 1)
                        vy = (xy[:, 1] + 1) / 2 * (sh - 1)
                        vz = (zn + 1) / 2 * (D - 1)
                        lo = [np.clip(np.floor(a.min()), 0, n - 1)
                              for a, n in ((vz, D), (vy, sh), (vx, sw))]
                        hi = [np.clip(np.ceil(a.max()) + 1, 1, n)
                              for a, n in ((vz, D), (vy, sh), (vx, sw))]
                        dims = [int(h - l) for l, h in zip(lo, hi)]
                        if min(dims) <= 0:
                            clipped += 1
                            continue
                        vol = dims[0] * dims[1] * dims[2]
                        stats[s].append(dims + [vol])
                        total_dma_bytes += vol * bytes_per_vox

    n_points = args.h * args.w * (args.coarse + args.fine)
    gather_rows = n_points * rows_per_point
    gather_bytes = gather_rows * bytes_per_vox
    # the coarse-pass DMA total above covers `coarse` samples; the fine pass
    # importance-concentrates in fewer bricks, bounded above by reusing the
    # same brick partition => scale conservatively by 2x
    dma_bytes_img = total_dma_bytes * (1 + args.fine / args.coarse)

    report = {
        "tile": args.tile, "zseg": args.zseg,
        "n_tiles": nt_y * nt_x, "n_zseg": n_seg,
        "gather_rows_per_image": gather_rows,
        "gather_row_bytes_per_image_gb": round(gather_bytes / 1e9, 2),
        "gather_time_at_13.5ns_row_s": round(gather_rows * 13.5e-9, 2),
        "dma_bytes_per_image_gb": round(dma_bytes_img / 1e9, 2),
        "dma_time_at_700gbps_s": round(dma_bytes_img / 700e9, 3),
        "dma_overfetch_vs_rows": round(dma_bytes_img / gather_bytes, 2),
        "clipped_bricks": clipped,
    }
    for s, rows in stats.items():
        a = np.array(rows, np.float64)
        report[s] = {
            "bricks": len(rows),
            "dims_p50": [float(x) for x in np.percentile(a[:, :3], 50, axis=0)],
            "dims_p95": [float(x) for x in np.percentile(a[:, :3], 95, axis=0)],
            "dims_max": [float(x) for x in a[:, :3].max(axis=0)],
            "kb_p50": round(float(np.percentile(a[:, 3], 50)) * bytes_per_vox / 1024, 1),
            "kb_p95": round(float(np.percentile(a[:, 3], 95)) * bytes_per_vox / 1024, 1),
            "kb_max": round(float(a[:, 3].max()) * bytes_per_vox / 1024, 1),
        }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
