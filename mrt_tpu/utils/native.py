"""ctypes loader for the native host runtime (native/mrt_native.cpp).

Compiles on first use with g++ (cached as build/libmrt_native.so); every
entry point has a pure-NumPy fallback, mirroring the reference's
capability-probe -> select-implementation seam (Renderer.swift:299-301).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_REPO = Path(__file__).resolve().parents[2]
_SRC = _REPO / "native" / "mrt_native.cpp"
_SO = _REPO / "build" / "libmrt_native.so"

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            _SO.parent.mkdir(exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)],
                check=True,
                capture_output=True,
                timeout=300,
            )
        lib = ctypes.CDLL(str(_SO))
        lib.mrt_build_wide_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.mrt_build_wide_bvh.restype = ctypes.c_int
        lib.mrt_build_wide_bvh_sp.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.mrt_build_wide_bvh_sp.restype = ctypes.c_int
        lib.mrt_wide_n_internal.restype = ctypes.c_int32
        lib.mrt_wide_n_leaves.restype = ctypes.c_int32
        lib.mrt_wide_depth.restype = ctypes.c_int32
        lib.mrt_wide_fetch.argtypes = [ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.mrt_wide_fetch_clip.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.mrt_obj_parse.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.mrt_obj_parse.restype = ctypes.c_int
        lib.mrt_obj_n_vertices.restype = ctypes.c_int64
        lib.mrt_obj_n_triangles.restype = ctypes.c_int64
        lib.mrt_obj_fetch.argtypes = [ctypes.POINTER(ctypes.c_float)] * 3 + [ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def build_wide_bvh_sah(tri_verts: np.ndarray, arity: int | None = None,
                       leaf_k: int | None = None, spatial: bool = False):
    """Binned-SAH wide topology. tri_verts: (T, 9) f32 [v0 v1 v2].

    Returns (node_child (Ni,ARITY) int32, leaf_tri (Nl,LEAF_K) int32, depth,
    leaf_clip) or None if the native library is unavailable. arity/leaf_k
    default to bvh.wide's tuned ARITY/LEAF_K.

    spatial=True enables SBVH reference splitting (PERF.md round 4g) and
    returns per-leaf clip boxes leaf_clip (Nl, 6) f32 [mn xyz, mx xyz] that
    refit must intersect into the computed leaf bounds — ONLY valid while
    the vertices equal what the builder saw (static geometry; stale clips
    would cut off deformed/moved triangles). spatial=False returns
    leaf_clip=None.
    """
    lib = _load()
    if lib is None:
        return None
    from ..bvh.wide import ARITY as _A, LEAF_K as _L

    ARITY = _A if arity is None else arity
    LEAF_K = _L if leaf_k is None else leaf_k
    tv = np.ascontiguousarray(tri_verts, np.float32)
    n = tv.shape[0]
    rc = lib.mrt_build_wide_bvh_sp(
        tv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, ARITY, LEAF_K,
        1 if spatial else 0,
    )
    if rc != 0:
        return None

    ni = int(lib.mrt_wide_n_internal())
    nl = int(lib.mrt_wide_n_leaves())
    depth = int(lib.mrt_wide_depth())
    child = np.empty((ni, ARITY), np.int32)
    leaf = np.empty((nl, LEAF_K), np.int32)
    lib.mrt_wide_fetch(
        child.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        leaf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    clip = None
    if spatial:
        clip = np.empty((nl, 6), np.float32)
        lib.mrt_wide_fetch_clip(clip.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return child, leaf, depth, clip


def parse_obj_geometry(path: str):
    """Fast native OBJ geometry parse. Returns (positions (V,3), uvs (V,2),
    normals (V,3) with NaN where unauthored, indices (T,3)) or None."""
    lib = _load()
    if lib is None:
        return None
    data = Path(path).read_bytes()
    rc = lib.mrt_obj_parse(data, len(data))
    if rc != 0:
        return None
    v = int(lib.mrt_obj_n_vertices())
    t = int(lib.mrt_obj_n_triangles())
    pos = np.empty((v, 3), np.float32)
    uv = np.empty((v, 2), np.float32)
    nrm = np.empty((v, 3), np.float32)
    idx = np.empty((t, 3), np.int32)
    lib.mrt_obj_fetch(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        uv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nrm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return pos, uv, nrm, idx
