"""Marching tetrahedra + TSDF fusion correctness tests."""
import numpy as np
import pytest

from uforecon_tpu.fusion.marching import marching_tetrahedra
from uforecon_tpu.fusion.tsdf import TSDFVolume


def sphere_field(n, radius, center=None):
    c = center if center is not None else np.array([n / 2] * 3)
    g = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing="ij"), -1).astype(np.float64)
    return np.linalg.norm(g - c, axis=-1) - radius


def test_marching_tetrahedra_sphere():
    n, r = 48, 16.0
    field = sphere_field(n, r)
    verts, faces = marching_tetrahedra(field, 0.0)
    assert len(verts) > 500 and len(faces) > 1000
    d = np.linalg.norm(verts - n / 2, axis=1)
    # linear interpolation error is sub-voxel
    assert np.abs(d - r).max() < 0.2
    # watertight-ish: every vertex used, indices valid
    assert faces.min() >= 0 and faces.max() < len(verts)
    used = np.zeros(len(verts), bool)
    used[faces.reshape(-1)] = True
    assert used.all()


def test_marching_tetrahedra_plane_area():
    """Surface area of an axis-aligned plane iso-surface ~ grid cross-section."""
    n = 20
    g = np.arange(n, dtype=np.float64)
    field = np.broadcast_to(g[:, None, None] - 9.5, (n, n, n)).copy()
    verts, faces = marching_tetrahedra(field, 0.0)
    np.testing.assert_allclose(verts[:, 0], 9.5, atol=1e-6)
    tri = verts[faces]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1
    ).sum()
    np.testing.assert_allclose(area, (n - 1) ** 2, rtol=1e-6)


def test_tsdf_integrates_synthetic_plane():
    """Fuse depth maps of a fronto-parallel plane; mesh must sit at z=4."""
    h, w = 60, 80
    f = 60.0
    intr = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    depth = np.full((h, w), 4.0, np.float32)
    c2w = np.eye(4, dtype=np.float32)  # camera at origin looking +z

    bnds = np.array([[-2, 2], [-2, 2], [3, 5]], np.float32)
    vol = TSDFVolume(bnds, voxel_size=0.05, margin=5, use_color=False)
    for _ in range(3):
        vol.integrate(depth, intr, c2w)

    verts, faces, _ = vol.get_mesh()
    assert len(verts) > 100
    # The zero crossing yields the true surface at z=4 plus the standard
    # back-of-truncation shell where the band meets unobserved (+1) voxels
    # (the reference volume has the same artifact; clean_mesh removes it).
    front = verts[verts[:, 2] < 4.0 + vol.trunc_margin / 2]
    assert len(front) > 100
    np.testing.assert_allclose(front[:, 2], 4.0, atol=0.06)
    # and within the viewing frustum laterally
    assert np.abs(front[:, 0]).max() < 2.8
    tsdf, weight = vol.get_volume()
    assert weight.max() == 3.0


def test_tsdf_sphere_reconstruction():
    """Depth renders of a synthetic sphere fuse into a spherical mesh."""
    h, w = 64, 64
    f = 64.0
    intr = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    center = np.array([0, 0, 4.0])
    radius = 1.0

    # ray-cast a sphere from a camera at origin
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    dirs = np.stack([(xs - w / 2) / f, (ys - h / 2) / f, np.ones_like(xs)], -1)
    dn = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    oc = -center
    b = (dn * oc).sum(-1)
    disc = b ** 2 - ((oc ** 2).sum() - radius ** 2)
    tray = np.where(disc > 0, -b - np.sqrt(np.maximum(disc, 0)), 0)
    depth = np.where(disc > 0, tray * dn[..., 2], 0).astype(np.float32)

    bnds = np.array([[-1.5, 1.5], [-1.5, 1.5], [2.5, 5.5]], np.float32)
    vol = TSDFVolume(bnds, voxel_size=0.04, margin=5, use_color=False)
    vol.integrate(depth, intr, np.eye(4, dtype=np.float32))
    verts, faces, _ = vol.get_mesh()
    assert len(verts) > 200
    d = np.linalg.norm(verts - center, axis=1)
    # visible hemisphere reconstructs at the right radius
    front = verts[:, 2] < center[2]
    assert np.abs(d[front] - radius).mean() < 0.05


def test_marching_cubes_sphere():
    """MC extracts the sphere iso-surface accurately and watertight."""
    from uforecon_tpu.fusion.marching import marching_cubes

    n = 32
    g = np.mgrid[:n, :n, :n].astype(np.float64)
    c, r = (n - 1) / 2, 10.0
    field = np.sqrt(((g - c) ** 2).sum(0)) - r
    verts, faces = marching_cubes(field, 0.0)
    d = np.abs(np.sqrt(((verts - c) ** 2).sum(1)) - r)
    assert len(faces) > 500
    assert d.max() < 0.05  # crossings of the trilinear field, sub-voxel

    # watertight with consistent winding: every edge shared by exactly two
    # faces, traversed once in each direction (sphere has no boundary)
    edges = {}
    for tri in faces:
        for a, b in [(tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])]:
            edges.setdefault((min(a, b), max(a, b)), []).append(a < b)
    assert all(len(v) == 2 and v[0] != v[1] for v in edges.values())


def test_marching_cubes_vs_tets_same_surface():
    """MC and tets triangulate the same zero-crossing field: chamfer between
    the two extractions is well below a voxel (the VERDICT-r1 quantification
    that switching triangulations cannot move DTU chamfer materially)."""
    from scipy.spatial import cKDTree

    from uforecon_tpu.fusion.marching import (marching_cubes,
                                              marching_tetrahedra)

    n = 32
    g = np.mgrid[:n, :n, :n].astype(np.float64)
    c, r = (n - 1) / 2, 10.0
    field = np.sqrt(((g - c) ** 2).sum(0)) - r
    from uforecon_tpu.eval.dtu_eval import sample_mesh_surface

    v_mc, f_mc = marching_cubes(field, 0.0)
    v_tet, f_tet = marching_tetrahedra(field, 0.0)
    p_mc = sample_mesh_surface(v_mc, f_mc, density=0.1)
    p_tet = sample_mesh_surface(v_tet, f_tet, density=0.1)
    d1 = cKDTree(p_tet).query(p_mc, k=1)[0]
    d2 = cKDTree(p_mc).query(p_tet, k=1)[0]
    # surface-to-surface: both triangulate the same trilinear zero set;
    # in DTU terms (1.5mm voxels) 0.05 voxel = 0.075mm, far inside the
    # 2% chamfer budget (typical chamfer ~0.5-1.5mm)
    assert max(d1.mean(), d2.mean()) < 0.05
    assert max(d1.max(), d2.max()) < 0.3
