"""CLI tools: log_to_csv parsing, tsdf/depth fusion drivers on fixture data."""
import os

import numpy as np

from uforecon_tpu.cli.log_to_csv import parse_log, main as log_main


def test_log_to_csv_roundtrip(tmp_path):
    log = tmp_path / "eval_final.log"
    log.write_text(
        "INFO:root:scan: 24 0.5000 0.6000 0.5500\n"
        "INFO:root:scan: 37 1.0000 2.0000 1.5000\n"
        "INFO:root:mean: 0.7500 1.3000 1.0250\n")
    rows = parse_log(str(log))
    assert len(rows) == 2
    assert rows[0] == {"scan": 24, "d2s": 0.5, "s2d": 0.6, "all": 0.55}
    out = tmp_path / "out.csv"
    log_main(["--log", str(log), "--out", str(out)])
    lines = out.read_text().strip().splitlines()
    assert lines[0] == "scan,d2s,s2d,all"
    assert len(lines) == 4  # header + 2 scans + mean


def _write_depth_layout(out_dir, scan="scanT", n_view=3, h=24, w=32):
    """Synthetic fronto-parallel plane depth maps seen by 3 cameras."""
    from uforecon_tpu.data.io import write_ply  # noqa: F401 (import check)

    K = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]], np.float32)
    os.makedirs(os.path.join(out_dir, "depth", scan), exist_ok=True)
    for i in range(n_view):
        E = np.eye(4, dtype=np.float32)
        E[0, 3] = 0.5 * i          # small x-translation baseline
        # gently sloped surface so the frustum (and TSDF band) spans depth
        ys = np.linspace(-1, 1, h, dtype=np.float32)[:, None]
        depth = 10.0 + 1.5 * ys * np.ones((h, w), np.float32)
        np.save(os.path.join(out_dir, "depth", scan, f"{i:08d}.npy"),
                {"depth": depth, "extrinsic": E, "intrinsic": K})
    return scan


def test_tsdf_fusion_cli(tmp_path):
    from uforecon_tpu.cli.tsdf_fusion import main

    scan = _write_depth_layout(str(tmp_path))
    main(["--out_dir", str(tmp_path), "--n_view", "3",
          "--voxel_size", "0.5", "--test_scan", scan])
    mesh_path = tmp_path / "mesh" / f"{scan}.ply"
    assert mesh_path.exists()
    from uforecon_tpu.data.io import read_ply
    verts, faces, _ = read_ply(str(mesh_path))
    assert len(verts) > 0 and faces is not None and len(faces) > 0
    # plane at z=10: all verts near that plane
    assert abs(np.median(verts[:, 2]) - 10.0) < 1.0


def test_depth_fusion_cli(tmp_path):
    from uforecon_tpu.cli.depth_fusion import main

    scan = _write_depth_layout(str(tmp_path))
    main(["--out_dir", str(tmp_path), "--n_view", "3",
          "--geo_mask_thres", "1", "--test_scan", scan])
    pcd = tmp_path / "pcd_fusion" / f"{scan}.ply"
    assert pcd.exists()
    from uforecon_tpu.data.io import read_ply
    pts, _, _ = read_ply(str(pcd))
    assert len(pts) > 0
    assert abs(np.median(pts[:, 2]) - 10.0) < 0.5
