"""Ray-mesh intersection via the native C++ BVH (Embree replacement).

The reference's frustum mesh filter depends on pyembree
(reference evaluation/clean_mesh.py:216 RayMeshIntersector.intersects_first);
here the same query runs through `native/bvh.cpp` (median-split BVH +
Moller-Trumbore, OpenMP over rays) bound with ctypes. A vectorized numpy
fallback keeps tests/environments without a compiler working (slow: O(rays
x tris) in chunks).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

# Search order: explicit override -> installed package copy (built by
# setup.py's build_py hook) -> repo checkout (built best-effort via make).
_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_REPO_NATIVE_DIR = os.path.join(_PKG_DIR, "..", "native")
_LIB_NAME = "libuforecon_bvh.so"
_lib = None


def _find_lib_path() -> Optional[str]:
    env = os.environ.get("UFO_BVH_LIB")
    if env:
        return env if os.path.exists(env) else None
    pkg_copy = os.path.join(_PKG_DIR, "native", _LIB_NAME)
    if os.path.exists(pkg_copy):
        return pkg_copy
    repo_copy = os.path.abspath(os.path.join(_REPO_NATIVE_DIR, _LIB_NAME))
    if not os.path.exists(repo_copy) and os.path.isdir(
            os.path.dirname(repo_copy)):
        try:  # best-effort build from source in a dev checkout
            subprocess.run(["make", "-C", os.path.dirname(repo_copy)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    return repo_copy if os.path.exists(repo_copy) else None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    path = _find_lib_path()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.bvh_build.restype = ctypes.c_void_p
    lib.bvh_build.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.bvh_free.argtypes = [ctypes.c_void_p]
    lib.bvh_intersect_first.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
    ]
    lib.bvh_intersect_any.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return lib


def _cptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


class RayMeshIntersector:
    """First-hit / any-hit ray queries against a triangle mesh."""

    def __init__(self, vertices: np.ndarray, faces: np.ndarray):
        self.vertices = np.ascontiguousarray(vertices, np.float32)
        self.faces = np.ascontiguousarray(faces, np.int32)
        self._lib = _load_lib()
        self._handle = None
        if self._lib is not None:
            self._handle = ctypes.c_void_p(self._lib.bvh_build(
                _cptr(self.vertices, ctypes.c_float), len(self.vertices),
                _cptr(self.faces, ctypes.c_int32), len(self.faces),
            ))

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.bvh_free(self._handle)
            self._handle = None

    @property
    def native(self) -> bool:
        return self._handle is not None

    # ------------------------------------------------------------------
    def intersects_first(self, origins: np.ndarray, dirs: np.ndarray
                         ) -> Tuple[np.ndarray, np.ndarray]:
        """Per ray: (triangle index or -1, hit distance or -1)."""
        origins = np.ascontiguousarray(origins, np.float32)
        dirs = np.ascontiguousarray(dirs, np.float32)
        n = len(origins)
        if self.native:
            out_tri = np.empty(n, np.int32)
            out_t = np.empty(n, np.float32)
            self._lib.bvh_intersect_first(
                self._handle, _cptr(origins, ctypes.c_float),
                _cptr(dirs, ctypes.c_float), n,
                _cptr(out_tri, ctypes.c_int32), _cptr(out_t, ctypes.c_float))
            return out_tri, out_t
        return self._numpy_first(origins, dirs)

    def intersects_any(self, origins: np.ndarray, dirs: np.ndarray,
                       t_max: Optional[np.ndarray] = None) -> np.ndarray:
        origins = np.ascontiguousarray(origins, np.float32)
        dirs = np.ascontiguousarray(dirs, np.float32)
        n = len(origins)
        if self.native:
            out = np.empty(n, np.uint8)
            tm = (np.ascontiguousarray(t_max, np.float32)
                  if t_max is not None else None)
            self._lib.bvh_intersect_any(
                self._handle, _cptr(origins, ctypes.c_float),
                _cptr(dirs, ctypes.c_float),
                _cptr(tm, ctypes.c_float) if tm is not None else None,
                n, _cptr(out, ctypes.c_uint8))
            return out.astype(bool)
        tri, t = self._numpy_first(origins, dirs)
        hit = tri >= 0
        if t_max is not None:
            hit &= (t >= 0) & (t <= t_max)
        return hit

    # ------------------------------------------------------------------
    def _numpy_first(self, origins, dirs, chunk: int = 2048):
        """Vectorized Moller-Trumbore fallback (no BVH)."""
        v = self.vertices
        f = self.faces
        p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]          # (T, 3)
        e1, e2 = p1 - p0, p2 - p0
        n = len(origins)
        out_tri = np.full(n, -1, np.int32)
        out_t = np.full(n, -1.0, np.float32)
        for s in range(0, n, chunk):
            o = origins[s:s + chunk, None]                        # (R,1,3)
            d = dirs[s:s + chunk, None]
            pv = np.cross(d, e2[None])                            # (R,T,3)
            det = np.sum(e1[None] * pv, -1)
            with np.errstate(divide="ignore", invalid="ignore"):
                inv = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)
                tv = o - p0[None]
                u = np.sum(tv * pv, -1) * inv
                qv = np.cross(tv, e1[None])
                w = np.sum(d * qv, -1) * inv
                t = np.sum(e2[None] * qv, -1) * inv
            ok = ((np.abs(det) > 1e-12) & (u >= -1e-6) & (w >= -1e-6)
                  & (u + w <= 1 + 1e-6) & (t >= 0))
            t = np.where(ok, t, np.inf)
            best = np.argmin(t, axis=1)
            bt = t[np.arange(len(best)), best]
            hit = np.isfinite(bt)
            out_tri[s:s + chunk][hit] = best[hit].astype(np.int32)
            out_t[s:s + chunk][hit] = bt[hit].astype(np.float32)
        return out_tri, out_t
