"""Chamfer eval + depth fusion correctness on synthetic geometry."""
import numpy as np

from uforecon_tpu.eval.dtu_eval import (
    eval_scan,
    radius_downsample,
    sample_mesh_surface,
)
from uforecon_tpu.fusion.depth_fusion import (
    check_geometric_consistency,
    filter_depth_maps,
)


def test_sample_mesh_surface_covers_triangles(rng):
    verts = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0]], np.float32)
    faces = np.array([[0, 1, 2]])
    pts = sample_mesh_surface(verts, faces, density=0.5)
    assert len(pts) > 200
    # all samples inside the triangle plane
    np.testing.assert_allclose(pts[:, 2], 0, atol=1e-6)
    assert pts[:, 0].min() >= -1e-6 and pts[:, 1].max() <= 10 + 1e-6


def test_radius_downsample_spacing(rng):
    pts = rng.random((2000, 3)).astype(np.float32) * 4
    out = radius_downsample(pts, radius=0.5)
    assert len(out) < len(pts)
    from scipy.spatial import cKDTree

    d, _ = cKDTree(out).query(out, k=2, workers=-1)
    assert d[:, 1].min() >= 0.5 - 1e-6


def test_eval_scan_chamfer_known_offset(rng):
    gt = rng.random((5000, 3)) * 100
    data = gt + np.array([1.0, 0, 0])  # uniform 1mm shift
    scores = eval_scan(data, gt)
    assert abs(scores["acc"] - 1.0) < 0.2
    assert abs(scores["comp"] - 1.0) < 0.2
    assert abs(scores["overall"] - (scores["acc"] + scores["comp"]) / 2) < 1e-9


def test_eval_scan_ground_plane_filters_completeness(rng):
    gt = rng.random((2000, 3)) * 10
    data = gt.copy()
    # plane z > 5: only upper half of GT counted for completeness
    plane = np.array([0, 0, 1, -5.0])
    s = eval_scan(data, gt, ground_plane=plane)
    assert s["comp"] < 0.01  # identical points -> ~0 regardless
    # remove upper GT region from data: completeness degrades only via plane
    data2 = data[data[:, 2] < 5]
    s2 = eval_scan(data2, gt, ground_plane=plane)
    s2_noplane = eval_scan(data2, gt)
    assert s2["comp"] > s2_noplane["comp"] * 1.5


def _plane_views():
    """Two cameras seeing the z=4 plane; consistent synthetic depths."""
    h, w = 48, 64
    f = 64.0
    intr = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float64)
    e0 = np.eye(4)
    e1 = np.eye(4)
    e1[:3, 3] = [-0.5, 0, 0]  # shifted camera

    def depth_of(ext):
        # plane z=4 in world; depth = 4 - cam_z_origin (cameras look +z)
        c2w = np.linalg.inv(ext)
        return np.full((h, w), 4.0 - c2w[2, 3], np.float64)

    return [
        {"depth": depth_of(e0), "intrinsic": intr, "extrinsic": e0},
        {"depth": depth_of(e1), "intrinsic": intr, "extrinsic": e1},
    ]


def test_geometric_consistency_plane():
    views = _plane_views()
    i4 = np.eye(4)
    i4[:3, :3] = views[0]["intrinsic"][:3, :3]
    m, z_re, _, _ = check_geometric_consistency(
        views[0]["depth"], i4, views[0]["extrinsic"],
        views[1]["depth"], i4, views[1]["extrinsic"],
    )
    # central pixels (visible in both) are consistent
    assert m[10:38, 20:44].mean() > 0.9


def test_filter_depth_maps_plane():
    views = _plane_views()
    for v in views:
        i4 = np.eye(4)
        i4[:3, :3] = v["intrinsic"][:3, :3]
        v["intrinsic"] = i4
    pts, _, masks = filter_depth_maps(views, geo_mask_thres=1)
    assert len(pts) > 1000
    np.testing.assert_allclose(pts[:, 2], 4.0, atol=1e-6)
