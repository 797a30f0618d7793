"""Native BVH raycaster and mesh-cleaning filters."""
import numpy as np
import pytest

from uforecon_tpu.postproc.raycast import RayMeshIntersector
from uforecon_tpu.postproc.clean_mesh import (
    clean_mesh, clean_mesh_faces_by_mask, face_connected_components)


def make_cube(center=(0, 0, 0), size=1.0):
    c = np.asarray(center, np.float32)
    s = size / 2
    v = np.array([[x, y, z] for x in (-s, s) for y in (-s, s) for z in (-s, s)],
                 np.float32) + c
    f = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
    ], np.int32)
    return v, f


def grid_sphere(n=24, radius=1.0):
    """Lat-long triangulated sphere."""
    th = np.linspace(1e-3, np.pi - 1e-3, n)
    ph = np.linspace(0, 2 * np.pi, n, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    pts = radius * np.stack([np.sin(T) * np.cos(P), np.cos(T),
                             np.sin(T) * np.sin(P)], -1).reshape(-1, 3)
    faces = []
    for i in range(n - 1):
        for j in range(n):
            a = i * n + j
            b = i * n + (j + 1) % n
            c = (i + 1) * n + j
            d = (i + 1) * n + (j + 1) % n
            faces += [[a, b, c], [b, d, c]]
    return pts.astype(np.float32), np.asarray(faces, np.int32)


def test_bvh_native_loads():
    v, f = make_cube()
    inter = RayMeshIntersector(v, f)
    assert inter.native, "native BVH library failed to build/load"


def test_first_hit_cube_distance():
    v, f = make_cube(center=(0, 0, 5), size=2.0)
    inter = RayMeshIntersector(v, f)
    o = np.array([[0, 0, 0]], np.float32)
    d = np.array([[0, 0, 1]], np.float32)
    tri, t = inter.intersects_first(o, d)
    assert tri[0] >= 0
    assert abs(t[0] - 4.0) < 1e-4  # front face at z=4
    # miss
    tri2, t2 = inter.intersects_first(o, np.array([[0, 0, -1]], np.float32))
    assert tri2[0] == -1 and t2[0] == -1


def test_native_matches_numpy_fallback(rng):
    v, f = grid_sphere(12)
    inter = RayMeshIntersector(v, f)
    n = 200
    o = rng.standard_normal((n, 3)).astype(np.float32) * 0.1 + [0, 0, -4]
    d = np.zeros((n, 3), np.float32)
    d[:, 2] = 1.0
    d += rng.standard_normal((n, 3)).astype(np.float32) * 0.15
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tri_n, t_n = inter.intersects_first(o, d)
    tri_p, t_p = inter._numpy_first(o, d)
    hit_n, hit_p = tri_n >= 0, tri_p >= 0
    assert (hit_n == hit_p).mean() > 0.99
    both = hit_n & hit_p
    np.testing.assert_allclose(t_n[both], t_p[both], atol=1e-3)


def test_intersects_any_tmax():
    v, f = make_cube(center=(0, 0, 5), size=2.0)
    inter = RayMeshIntersector(v, f)
    o = np.array([[0, 0, 0]], np.float32)
    d = np.array([[0, 0, 1]], np.float32)
    assert inter.intersects_any(o, d)[0]
    assert not inter.intersects_any(o, d, t_max=np.array([3.0], np.float32))[0]


def test_connected_components():
    v1, f1 = make_cube(center=(0, 0, 0))
    v2, f2 = make_cube(center=(10, 0, 0))
    faces = np.concatenate([f1, f2 + len(v1)])
    labels = face_connected_components(faces)
    assert len(np.unique(labels)) == 2
    assert (labels[:12] == labels[0]).all()
    assert (labels[12:] == labels[12]).all()
    assert labels[0] != labels[12]


def test_clean_mesh_removes_outlier_component():
    """A sphere at origin plus a distant cube: masks cover only the sphere,
    so the cube must be removed; most sphere faces survive."""
    from helpers import look_at

    vs, fs = grid_sphere(16, radius=1.0)
    vc, fc = make_cube(center=(0, 8, 0), size=1.0)
    verts = np.concatenate([vs, vc])
    faces = np.concatenate([fs, fc + len(vs)])

    w = h = 96
    K = np.array([[120.0, 0, w / 2], [0, 120.0, h / 2], [0, 0, 1]], np.float32)
    masks, intrs, w2cs = [], [], []
    for i in range(3):
        ang = 0.5 * i
        E = look_at([5 * np.sin(ang), 0.3, -5 * np.cos(ang)])
        # mask = projected sphere footprint (circle around principal point)
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        mask = (xs - w / 2) ** 2 + (ys - h / 2) ** 2 < (0.30 * w) ** 2
        masks.append(mask)
        intrs.append(K)
        w2cs.append(E)

    v2, f2 = clean_mesh(verts, faces, masks, intrs, w2cs,
                        minimal_vis=1, min_component_faces=50)
    assert len(f2) > 0
    # every surviving vertex is near the unit sphere, none near the cube
    r = np.linalg.norm(v2, axis=1)
    assert r.max() < 2.0
    # most of the sphere survives
    assert len(f2) > 0.3 * len(fs)


def test_mask_filter_keeps_visible(rng):
    from helpers import look_at

    v, f = grid_sphere(12, radius=1.0)
    w = h = 64
    K = np.array([[80.0, 0, w / 2], [0, 80.0, h / 2], [0, 0, 1]], np.float32)
    E = look_at([0, 0, -5])
    full = np.ones((h, w), bool)
    v2, f2 = clean_mesh_faces_by_mask([*map(np.asarray, (v,))][0], f,
                                      [full, full], [K, K], [E, E],
                                      minimal_vis=1)
    # everything visible in both views -> nothing removed
    assert len(f2) == len(f)


def test_interpolate_poses_endpoints():
    from helpers import look_at
    from uforecon_tpu.postproc.trajectory import interpolate_poses

    a = look_at([0, 0, -5])
    b = look_at([5, 0, 0])
    poses = interpolate_poses([a, b], n_frames=11)
    assert len(poses) == 11
    np.testing.assert_allclose(poses[0], a, atol=1e-5)
    np.testing.assert_allclose(poses[-1], b, atol=1e-5)
    # midway rotation is orthonormal
    R = poses[5][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_render_trajectory_frames(tmp_path):
    from helpers import look_at
    from uforecon_tpu.postproc.trajectory import render_trajectory

    v, f = grid_sphere(12, radius=1.0)
    K = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
    w2cs = [look_at([0, 0, -4]), look_at([2, 0.5, -3.5])]
    gif = tmp_path / "traj.gif"
    frames = render_trajectory(v, f, w2cs, K, wh=(64, 48), n_frames=4,
                               out_path=str(gif))
    assert len(frames) == 4
    assert frames[0].shape == (48, 64, 3)
    # sphere occupies the center: center pixel darker than background corner
    assert frames[0][24, 32].mean() < frames[0][0, 0].mean()
    assert gif.exists()
