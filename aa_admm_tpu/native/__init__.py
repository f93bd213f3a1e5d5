"""ctypes bindings for the native host runtime (native/aaadmm_native.cpp).

Builds the shared library on first use if g++ is available; every entry
point has a pure-NumPy fallback, so the package works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False
_SRC_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_SRC_DIR, "libaaadmm_native.so")
    if not os.path.exists(so):
        src = os.path.join(_SRC_DIR, "aaadmm_native.cpp")
        if os.path.exists(src):
            try:
                subprocess.run(["make", "-C", _SRC_DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
    if not os.path.exists(so):
        return None
    lib = ctypes.CDLL(so)
    lib.aabb_build.restype = ctypes.c_void_p
    lib.aabb_build.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                               ctypes.c_void_p, ctypes.c_int64]
    lib.aabb_free.argtypes = [ctypes.c_void_p]
    lib.aabb_closest_points.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                        ctypes.c_int64, ctypes.c_void_p,
                                        ctypes.c_void_p]
    lib.obj_parse.restype = ctypes.c_int
    lib.obj_parse.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                              ctypes.POINTER(ctypes.c_int64), ctypes.c_void_p,
                              ctypes.POINTER(ctypes.c_int64)]
    lib.elenode_parse.restype = ctypes.c_int
    lib.elenode_parse.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                  ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_int64),
                                  ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_int64)]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


class AabbTree:
    """Median-split AABB tree over a triangle soup; batched closest-point
    queries (host-side equivalent of igl::AABB / TriMeshAABB)."""

    def __init__(self, verts: np.ndarray, tris: np.ndarray):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._verts = np.ascontiguousarray(verts, np.float64)
        self._tris = np.ascontiguousarray(tris, np.int32)
        self._handle = lib.aabb_build(
            self._verts.ctypes.data_as(ctypes.c_void_p), len(self._verts),
            self._tris.ctypes.data_as(ctypes.c_void_p), len(self._tris))

    def closest_points(self, queries: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
        q = np.ascontiguousarray(queries, np.float64)
        out = np.empty_like(q)
        sqd = np.empty(len(q))
        self._lib.aabb_closest_points(
            ctypes.c_void_p(self._handle),
            q.ctypes.data_as(ctypes.c_void_p), len(q),
            out.ctypes.data_as(ctypes.c_void_p),
            sqd.ctypes.data_as(ctypes.c_void_p))
        return out, sqd

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.aabb_free(ctypes.c_void_p(self._handle))
        except Exception:
            pass


def host_closest_points(ref_verts, ref_tris, queries):
    """Closest surface points on host: native BVH if available, else a
    NumPy brute-force fallback."""
    if available():
        tree = AabbTree(np.asarray(ref_verts), np.asarray(ref_tris))
        pts, _ = tree.closest_points(np.asarray(queries))
        return pts
    # NumPy fallback via the jax kernel on CPU
    import jax.numpy as jnp
    from ..ops.closest_point import closest_point_on_mesh
    tri = np.asarray(ref_verts)[np.asarray(ref_tris)]
    return np.asarray(closest_point_on_mesh(jnp.asarray(queries),
                                            jnp.asarray(tri)))


def load_obj_native(path: str):
    """Fast OBJ parse via native code; returns (verts, tris) or None."""
    lib = _load()
    if lib is None:
        return None
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    rc = lib.obj_parse(path.encode(), None, ctypes.byref(nv), None,
                       ctypes.byref(nt))
    if rc != 0:
        return None
    verts = np.empty((nv.value, 3))
    tris = np.empty((nt.value, 3), np.int32)
    lib.obj_parse(path.encode(), verts.ctypes.data_as(ctypes.c_void_p),
                  ctypes.byref(nv), tris.ctypes.data_as(ctypes.c_void_p),
                  ctypes.byref(nt))
    return verts, tris


def load_elenode_native(basename: str):
    lib = _load()
    if lib is None:
        return None
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    ele = (basename + ".ele").encode()
    node = (basename + ".node").encode()
    rc = lib.elenode_parse(ele, node, None, ctypes.byref(nv), None,
                           ctypes.byref(nt))
    if rc != 0:
        return None
    verts = np.empty((nv.value, 3))
    tets = np.empty((nt.value, 4), np.int32)
    lib.elenode_parse(ele, node, verts.ctypes.data_as(ctypes.c_void_p),
                      ctypes.byref(nv), tets.ctypes.data_as(ctypes.c_void_p),
                      ctypes.byref(nt))
    return verts, tets
