"""Iso-surface extraction: vectorized marching cubes + marching tetrahedra.

Replacement for the reference's native marching-cubes dependencies
(skimage.measure.marching_cubes_lewiner in tsdf_fusion.py:325,345 and
PyMCubes in model.py:880 — neither available here, both C/Cython).

`marching_cubes` is the default (reference-parity triangulation): the
256-case table is GENERATED at import time rather than hard-coded — for
each corner-sign configuration, the inside corners are split into
cube-edge-connected components, each component's crossed edges are linked
into boundary cycles by walking the cube faces (every maximal arc of
inside corners along a face boundary contributes one segment, which is the
classic "separated" resolution of the ambiguous face), and each cycle is
fan-triangulated with outward orientation. Crossings are linearly
interpolated along cube edges exactly as in Lorensen-Cline/Lewiner.

`marching_tetrahedra` (6-tet decomposition) is kept as an alternative;
both triangulate the same zero-crossing set of the same grid, MC via the
12 cube edges only, tets additionally through face/body diagonals.

Fully vectorized numpy: no per-cell python loops. Vertices are deduplicated
by global edge id so meshes are watertight across cells.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

# 6-tetrahedra decomposition of the unit cube (corner indices 0..7 with
# corner c = (x + 2*y + 4*z) bit layout). All tets share the main diagonal
# 0-7, which makes neighbouring cubes consistent.
_TETS = np.array(
    [
        [0, 5, 1, 7],
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
        [0, 4, 5, 7],
    ],
    np.int32,
)

_CORNER_OFFSETS = np.array(
    [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
     [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]],
    np.int32,
)

# For each of the 16 sign cases of a tet (bit i set = vertex i below iso),
# the crossing triangles as pairs of tet-vertex indices (edges). -1 padded.
# Cases with 1 or 3 inside give one triangle, 2 inside give two.
_TET_EDGES = {
    # one inside
    0b0001: [[(0, 1), (0, 2), (0, 3)]],
    0b0010: [[(1, 0), (1, 3), (1, 2)]],
    0b0100: [[(2, 0), (2, 1), (2, 3)]],
    0b1000: [[(3, 0), (3, 2), (3, 1)]],
    # two inside
    0b0011: [[(0, 2), (0, 3), (1, 3)], [(0, 2), (1, 3), (1, 2)]],
    0b0101: [[(0, 1), (2, 3), (0, 3)], [(0, 1), (2, 1), (2, 3)]],
    0b1001: [[(0, 1), (0, 2), (3, 2)], [(0, 1), (3, 2), (3, 1)]],
    0b0110: [[(1, 0), (2, 0), (2, 3)], [(1, 0), (2, 3), (1, 3)]],
    0b1010: [[(1, 0), (1, 2), (3, 2)], [(3, 0), (1, 0), (3, 2)]],
    0b1100: [[(2, 0), (3, 0), (3, 1)], [(2, 0), (3, 1), (2, 1)]],
    # three inside (complement of one)
    0b1110: [[(0, 1), (0, 3), (0, 2)]],
    0b1101: [[(1, 0), (1, 2), (1, 3)]],
    0b1011: [[(2, 0), (2, 3), (2, 1)]],
    0b0111: [[(3, 0), (3, 1), (3, 2)]],
}

# Dense tables: for case c, up to 2 triangles x 3 edges x (va, vb); -1 pad.
_TRI_TABLE = np.full((16, 2, 3, 2), -1, np.int32)
_TRI_COUNT = np.zeros(16, np.int32)
for case, tris in _TET_EDGES.items():
    _TRI_COUNT[case] = len(tris)
    for t, tri in enumerate(tris):
        for e, (a, b) in enumerate(tri):
            _TRI_TABLE[case, t, e] = (a, b)


def marching_tetrahedra(
    field: np.ndarray, level: float = 0.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the `level` iso-surface of a 3D scalar field.

    Args:
      field: (X, Y, Z) scalar grid.
      level: iso value.

    Returns:
      (vertices (N, 3) in grid-index coordinates, faces (M, 3) int32).
    """
    f = np.asarray(field, np.float32)
    nx, ny, nz = f.shape
    if min(nx, ny, nz) < 2:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    inside = f < level  # "inside" = below iso (negative TSDF = behind surface)

    # cell corner values/flags: (nx-1, ny-1, nz-1, 8)
    def corners(arr):
        out = np.empty((nx - 1, ny - 1, nz - 1, 8), arr.dtype)
        for c, (dx, dy, dz) in enumerate(_CORNER_OFFSETS):
            out[..., c] = arr[dx:nx - 1 + dx, dy:ny - 1 + dy, dz:nz - 1 + dz]
        return out

    cv = corners(f)
    ci = corners(inside)

    # active cells: sign change among corners
    any_in = ci.any(axis=-1)
    all_in = ci.all(axis=-1)
    active = np.argwhere(any_in & ~all_in)  # (A, 3)
    if len(active) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    a_vals = cv[active[:, 0], active[:, 1], active[:, 2]]   # (A, 8)
    a_in = ci[active[:, 0], active[:, 1], active[:, 2]]     # (A, 8)

    # per tet: case index (A, 6)
    tet_in = a_in[:, _TETS]  # (A, 6, 4)
    case = (tet_in * np.array([1, 2, 4, 8], np.int32)).sum(-1)  # (A, 6)

    n_tri = _TRI_COUNT[case]            # (A, 6)
    tri_mask = np.arange(2)[None, None, :] < n_tri[..., None]  # (A, 6, 2)
    A_idx, T_idx, K_idx = np.nonzero(tri_mask)
    if len(A_idx) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    tri_edges = _TRI_TABLE[case[A_idx, T_idx], K_idx]  # (T, 3, 2) tet-vertex ids
    tet_verts = _TETS[T_idx]                           # (T, 4) cube corners
    va = np.take_along_axis(tet_verts, tri_edges[:, :, 0], axis=1)  # (T, 3)
    vb = np.take_along_axis(tet_verts, tri_edges[:, :, 1], axis=1)

    return _interp_and_index(active[A_idx], a_vals[A_idx], va, vb, level,
                             (nx, ny, nz))


def _interp_and_index(cell, vals, va, vb, level, dims):
    """Shared emission tail: interpolate zero crossings along (va, vb) cube
    edges of each triangle, dedupe vertices by global edge id, build faces.

    cell: (T, 3) cell indices; vals: (T, 8) corner values; va/vb: (T, 3)
    cube-corner ids per triangle vertex.
    """
    nx, ny, nz = dims

    # global edge id: cube corner -> global grid vertex id, edge = sorted pair
    def corner_gid(corner):
        off = _CORNER_OFFSETS[corner]  # (T, 3, 3)
        gx = cell[:, None, 0] + off[..., 0]
        gy = cell[:, None, 1] + off[..., 1]
        gz = cell[:, None, 2] + off[..., 2]
        return (gx * ny + gy) * nz + gz  # (T, 3)

    ga = corner_gid(va)
    gb = corner_gid(vb)
    lo = np.minimum(ga, gb)
    hi = np.maximum(ga, gb)
    edge_key = lo.astype(np.int64) * (nx * ny * nz) + hi  # (T, 3)

    # interpolated positions along each edge
    fa = np.take_along_axis(vals, va, axis=1)  # (T, 3)
    fb = np.take_along_axis(vals, vb, axis=1)
    denom = fb - fa
    t = np.where(np.abs(denom) > 1e-12, (level - fa) / np.where(denom == 0, 1, denom), 0.5)
    t = np.clip(t, 0.0, 1.0)
    pa = (cell[:, None, :] + _CORNER_OFFSETS[va]).astype(np.float32)
    pb = (cell[:, None, :] + _CORNER_OFFSETS[vb]).astype(np.float32)
    pos = pa + t[..., None] * (pb - pa)  # (T, 3, 3)

    # dedupe vertices by edge key
    keys_flat = edge_key.reshape(-1)
    uniq, inv = np.unique(keys_flat, return_inverse=True)
    verts = np.zeros((len(uniq), 3), np.float32)
    verts[inv] = pos.reshape(-1, 3)
    faces = inv.reshape(-1, 3).astype(np.int32)

    # drop degenerate faces (two identical vertex ids)
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return verts, faces[ok]


# --------------------------------------------------------------------------
# Marching cubes: constructive 256-case table
# --------------------------------------------------------------------------

# the 12 cube edges as sorted corner pairs (corner bit layout c = x+2y+4z)
_CUBE_EDGE_PAIRS = [
    (c, c ^ bit) for c in range(8) for bit in (1, 2, 4) if c < (c ^ bit)
]
_EDGE_ID = {p: i for i, p in enumerate(_CUBE_EDGE_PAIRS)}
_EDGE_A = np.array([p[0] for p in _CUBE_EDGE_PAIRS], np.int32)
_EDGE_B = np.array([p[1] for p in _CUBE_EDGE_PAIRS], np.int32)

# the 6 faces, corners in cyclic boundary order (consecutive = cube edge)
_FACES_CYCLIC = [
    (0, 2, 6, 4), (1, 3, 7, 5),   # x = 0 / 1
    (0, 1, 5, 4), (2, 3, 7, 6),   # y = 0 / 1
    (0, 1, 3, 2), (4, 5, 7, 6),   # z = 0 / 1
]


def _gen_mc_case(config: int):
    """Triangles (as edge-id triples) for one corner-sign configuration.

    Inside corners are grouped into cube-edge-connected components; each
    component's crossed edges are linked into boundary cycles by walking the
    faces (one segment per maximal arc of inside corners along a face
    boundary — the "separated" treatment of the ambiguous face), then each
    cycle is fan-triangulated with normals pointing away from the inside.
    """
    inside = [c for c in range(8) if (config >> c) & 1]
    if not inside or len(inside) == 8:
        return []
    inside_set = set(inside)

    def edge(a, b):
        return _EDGE_ID[(a, b) if a < b else (b, a)]

    comps, seen = [], set()
    for c0 in inside:
        if c0 in seen:
            continue
        stack, comp = [c0], set()
        while stack:
            u = stack.pop()
            if u in comp:
                continue
            comp.add(u)
            seen.add(u)
            stack.extend(u ^ bit for bit in (1, 2, 4)
                         if (u ^ bit) in inside_set and (u ^ bit) not in comp)
        comps.append(comp)

    tris = []
    for comp in comps:
        adj = {}
        for face in _FACES_CYCLIC:
            inf = [c in comp for c in face]
            if not any(inf) or all(inf):
                continue
            for i in range(4):
                if inf[i] and not inf[i - 1]:
                    j = i
                    while inf[(j + 1) % 4]:
                        j = (j + 1) % 4
                    e1 = edge(face[i], face[i - 1])
                    e2 = edge(face[j], face[(j + 1) % 4])
                    adj.setdefault(e1, []).append(e2)
                    adj.setdefault(e2, []).append(e1)

        # each crossed edge lies on exactly 2 faces -> exactly 2 partners;
        # the segments decompose into disjoint cycles
        visited = set()
        cycles = []
        for start in adj:
            if start in visited:
                continue
            cyc = [start]
            visited.add(start)
            prev, cur = start, adj[start][0]
            while cur != start:
                cyc.append(cur)
                visited.add(cur)
                nxt = adj[cur][1] if adj[cur][0] == prev else adj[cur][0]
                prev, cur = cur, nxt
            cycles.append(cyc)

        corner_pos = _CORNER_OFFSETS.astype(np.float64)
        comp_centroid = corner_pos[list(comp)].mean(axis=0)
        for cyc in cycles:
            mids = np.array([
                (corner_pos[_CUBE_EDGE_PAIRS[e][0]]
                 + corner_pos[_CUBE_EDGE_PAIRS[e][1]]) / 2 for e in cyc])
            # Newell polygon normal; flip so it points away from the inside
            normal = np.cross(mids, np.roll(mids, -1, axis=0)).sum(axis=0)
            outward = mids.mean(axis=0) - comp_centroid
            if np.dot(normal, outward) < 0:
                cyc = cyc[::-1]
            tris.extend((cyc[0], cyc[k], cyc[k + 1])
                        for k in range(1, len(cyc) - 1))
    return tris


_MC_TABLE = [_gen_mc_case(c) for c in range(256)]
_MC_MAX = max(len(t) for t in _MC_TABLE)
_MC_COUNT = np.array([len(t) for t in _MC_TABLE], np.int32)
_MC_TRIS = np.full((256, _MC_MAX, 3), 0, np.int32)
for _c, _tris in enumerate(_MC_TABLE):
    for _t, _tri in enumerate(_tris):
        _MC_TRIS[_c, _t] = _tri


def marching_cubes(field: np.ndarray, level: float = 0.0
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the `level` iso-surface with classic marching cubes
    (reference-parity triangulation: skimage marching_cubes_lewiner at
    tsdf_fusion.py:325,345 — same crossings, same 12-edge interpolation).

    Args:
      field: (X, Y, Z) scalar grid.
      level: iso value.

    Returns:
      (vertices (N, 3) in grid-index coordinates, faces (M, 3) int32).
    """
    f = np.asarray(field, np.float32)
    nx, ny, nz = f.shape
    empty = (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))
    if min(nx, ny, nz) < 2:
        return empty

    inside = f < level

    def corners(arr):
        out = np.empty((nx - 1, ny - 1, nz - 1, 8), arr.dtype)
        for c, (dx, dy, dz) in enumerate(_CORNER_OFFSETS):
            out[..., c] = arr[dx:nx - 1 + dx, dy:ny - 1 + dy, dz:nz - 1 + dz]
        return out

    cv = corners(f)
    ci = corners(inside)
    any_in = ci.any(axis=-1)
    all_in = ci.all(axis=-1)
    active = np.argwhere(any_in & ~all_in)  # (A, 3)
    if len(active) == 0:
        return empty

    a_vals = cv[active[:, 0], active[:, 1], active[:, 2]]   # (A, 8)
    a_in = ci[active[:, 0], active[:, 1], active[:, 2]]     # (A, 8)
    config = (a_in.astype(np.int32) << np.arange(8, dtype=np.int32)).sum(-1)

    n_tri = _MC_COUNT[config]                               # (A,)
    tri_mask = np.arange(_MC_MAX)[None, :] < n_tri[:, None]
    A_idx, T_idx = np.nonzero(tri_mask)
    if len(A_idx) == 0:
        return empty

    eids = _MC_TRIS[config[A_idx], T_idx]                   # (T, 3) edge ids
    va = _EDGE_A[eids]
    vb = _EDGE_B[eids]
    return _interp_and_index(active[A_idx], a_vals[A_idx], va, vb, level,
                             (nx, ny, nz))
