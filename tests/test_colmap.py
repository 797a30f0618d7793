"""COLMAP model readers and MVSNet export."""
import os
import struct

import numpy as np
import pytest

from uforecon_tpu.data import colmap, io


def _make_text_model(d, n_views=4, n_pts=60):
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((n_pts, 3)) * 0.5
    with open(d / "cameras.txt", "w") as f:
        f.write("# comment\n")
        f.write("1 PINHOLE 640 480 500 500 320 240\n")

    lines = ["# images"]
    for i in range(n_views):
        ang = 0.4 * i
        # camera on a ring at radius 4 looking roughly at origin
        t = np.array([0, 0, 4.0])
        q = np.array([np.cos(ang / 2), 0, np.sin(ang / 2), 0])  # yaw
        obs = []
        R = colmap.qvec_to_rotmat(q)
        for pid, p in enumerate(pts):
            c = R @ p + t
            if c[2] > 0.5:
                obs += [f"{320 + 100 * c[0] / c[2]:.2f}",
                        f"{240 + 100 * c[1] / c[2]:.2f}", str(pid)]
        lines.append(f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} "
                     f"{t[0]} {t[1]} {t[2]} 1 img_{i:04d}.jpg")
        lines.append(" ".join(obs))
    (d / "images.txt").write_text("\n".join(lines) + "\n")

    with open(d / "points3D.txt", "w") as f:
        f.write("# points\n")
        for pid, p in enumerate(pts):
            f.write(f"{pid} {p[0]} {p[1]} {p[2]} 128 128 128 0.5 "
                    f"1 0 2 0\n")
    return pts


def test_read_text_model(tmp_path):
    pts = _make_text_model(tmp_path)
    cams, imgs, points = colmap.read_model(str(tmp_path))
    assert cams[1].model == "PINHOLE"
    np.testing.assert_allclose(cams[1].K[0, 0], 500)
    assert len(imgs) == 4
    assert len(points) == len(pts)
    assert len(imgs[1].point3d_ids) > 0


def test_read_binary_model(tmp_path):
    # binary writers inline (format: reconstruction_io.cc)
    with open(tmp_path / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))  # PINHOLE
        f.write(struct.pack("<4d", 500, 500, 320, 240))
    with open(tmp_path / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<i", 7))
        f.write(struct.pack("<4d", 1, 0, 0, 0))
        f.write(struct.pack("<3d", 0.1, 0.2, 4.0))
        f.write(struct.pack("<i", 1))
        f.write(b"img.jpg\x00")
        f.write(struct.pack("<Q", 2))
        for x, y, pid in [(10.0, 20.0, 3), (30.0, 40.0, -1)]:
            f.write(struct.pack("<2d", x, y))
            f.write(struct.pack("<q", pid))
    with open(tmp_path / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<Q", 3))
        f.write(struct.pack("<3d", 1.0, 2.0, 3.0))
        f.write(struct.pack("<3B", 255, 0, 0))
        f.write(struct.pack("<d", 0.5))
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<ii", 7, 0))

    cams, imgs, points = colmap.read_model(str(tmp_path))
    assert cams[1].width == 640
    img = imgs[7]
    assert img.name == "img.jpg"
    np.testing.assert_allclose(img.tvec, [0.1, 0.2, 4.0])
    assert list(img.point3d_ids) == [3]
    np.testing.assert_allclose(points[3], [1.0, 2.0, 3.0])


def test_export_mvsnet(tmp_path):
    _make_text_model(tmp_path)
    out = tmp_path / "mvs"
    colmap.export_mvsnet(str(tmp_path), str(out), n_src=2)
    cam = io.read_cam_file(str(out / "cams" / "00000000_cam.txt"))
    assert cam["extrinsic"].shape == (4, 4)
    assert cam["depth_min"] > 0 and cam["depth_interval"] > 0
    pairs = io.read_pair_file(str(out / "pair.txt"))
    assert len(pairs) == 4
    ref, srcs = pairs[0]
    assert ref == 0 and 1 <= len(srcs) <= 2
    # nearby views should score higher than distant ones
    assert srcs[0] != 0
