"""ctypes bindings for the native runtime (native/craynative.cpp).

Provides the C++ fast paths for scene ingest and accel build — the
counterparts of the reference's C++ OBJ loader (objloader/objloader.h) and
BVH builder (accelerator/bvh.h) — with automatic build-on-first-use and
graceful fallback to the numpy implementations when the toolchain is
unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_NAME_STRIDE = 256


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_NATIVE_DIR, "libcraynative.so")
    src = os.path.join(_NATIVE_DIR, "craynative.cpp")
    stale = (os.path.exists(so) and os.path.exists(src)
             and os.path.getmtime(src) > os.path.getmtime(so))
    if not os.path.exists(so) or stale:
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None

    c = ctypes
    lib.crn_load_obj.restype = c.c_void_p
    lib.crn_load_obj.argtypes = [c.c_char_p]
    lib.crn_obj_counts.restype = c.c_int64
    lib.crn_obj_counts.argtypes = [c.c_void_p] + [c.POINTER(c.c_int64)] * 5
    lib.crn_obj_copy.restype = c.c_int64
    lib.crn_obj_copy.argtypes = [
        c.c_void_p, c.POINTER(c.c_float), c.POINTER(c.c_float), c.POINTER(c.c_float),
        c.POINTER(c.c_int32), c.POINTER(c.c_int32), c.c_char_p, c.c_char_p,
        c.c_char_p, c.c_int64,
    ]
    lib.crn_obj_free.argtypes = [c.c_void_p]
    lib.crn_build_bvh.restype = c.c_void_p
    lib.crn_build_bvh.argtypes = [c.POINTER(c.c_float)] * 3 + [c.c_int64, c.c_int32, c.c_int32]
    lib.crn_bvh_counts.restype = c.c_int64
    lib.crn_bvh_counts.argtypes = [c.c_void_p, c.POINTER(c.c_int64), c.POINTER(c.c_int64)]
    lib.crn_bvh_copy.restype = c.c_int64
    lib.crn_bvh_copy.argtypes = [
        c.c_void_p, c.POINTER(c.c_float), c.POINTER(c.c_float),
        c.POINTER(c.c_int32), c.POINTER(c.c_int32), c.POINTER(c.c_int32),
        c.POINTER(c.c_int32), c.POINTER(c.c_int32),
    ]
    lib.crn_bvh_free.argtypes = [c.c_void_p]
    for name in ("crn_bvh_fat", "crn_bvh4_fat"):
        fn = getattr(lib, name, None)
        if fn is not None:
            fn.restype = c.c_int64
            fn.argtypes = [c.c_void_p] + [c.POINTER(c.c_float)] * 3 + [
                c.c_int32, c.POINTER(c.c_float)]
    if hasattr(lib, "crn_bvh4_collapse"):
        lib.crn_bvh4_collapse.restype = c.c_int64
        lib.crn_bvh4_collapse.argtypes = [c.c_void_p, c.POINTER(c.c_int64)]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def load_obj_native(path: str):
    """Fast OBJ scan. Returns None when the native lib is unavailable, else
    (positions, texcoords|None, normals|None, corners[N,3,3], groups, mtllib)
    where groups is a list of (face_begin, face_end, name, mat)."""
    lib = _load()
    if lib is None:
        return None
    h = lib.crn_load_obj(path.encode())
    if not h:
        return None
    try:
        n = [ctypes.c_int64() for _ in range(5)]
        lib.crn_obj_counts(h, *[ctypes.byref(x) for x in n])
        n_pos, n_tex, n_nrm, n_corners, n_groups = (x.value for x in n)
        pos = np.empty((max(n_pos, 1), 3), np.float32)
        tex = np.empty((max(n_tex, 1), 2), np.float32)
        nrm = np.empty((max(n_nrm, 1), 3), np.float32)
        # n_corners counts face corners; each corner is an (v, vt, vn) triple
        # and 3 corners form a triangle
        corners = np.empty((max(n_corners, 1), 3), np.int32)
        ranges = np.empty((max(n_groups, 1), 2), np.int32)
        names = ctypes.create_string_buffer(_NAME_STRIDE * max(n_groups, 1))
        mats = ctypes.create_string_buffer(_NAME_STRIDE * max(n_groups, 1))
        mtllib = ctypes.create_string_buffer(_NAME_STRIDE)
        lib.crn_obj_copy(h, _fptr(pos), _fptr(tex), _fptr(nrm), _iptr(corners),
                         _iptr(ranges), names, mats, mtllib, _NAME_STRIDE)
        groups = []
        for i in range(n_groups):
            name = names.raw[i * _NAME_STRIDE:(i + 1) * _NAME_STRIDE].split(b"\0")[0]
            mat = mats.raw[i * _NAME_STRIDE:(i + 1) * _NAME_STRIDE].split(b"\0")[0]
            # C++ ranges are in corner units; 3 corners per triangle
            groups.append((int(ranges[i, 0]) // 3, int(ranges[i, 1]) // 3,
                           name.decode("latin-1"), mat.decode("latin-1")))
        return (
            pos[:n_pos],
            tex[:n_tex] if n_tex else None,
            nrm[:n_nrm] if n_nrm else None,
            corners[:n_corners].reshape(-1, 3, 3),  # [tris, corner, (v,vt,vn)]
            groups,
            mtllib.value.decode("latin-1"),
        )
    finally:
        lib.crn_obj_free(h)


def build_bvh_native(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
                     leaf_size: int = 4, split: str = "median"):
    """Binary BVH build in C++ (median or exact-sweep SAH). Returns None if
    unavailable, else the flat arrays (node_min, node_max, right, axis,
    first, count, order)."""
    lib = _load()
    if lib is None:
        return None
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    n = v0.shape[0]
    h = lib.crn_build_bvh(_fptr(v0), _fptr(v1), _fptr(v2), n, leaf_size,
                          SPLIT_MODES[split])
    if not h:
        return None
    try:
        n_nodes = ctypes.c_int64()
        n_order = ctypes.c_int64()
        lib.crn_bvh_counts(h, ctypes.byref(n_nodes), ctypes.byref(n_order))
        m, t = n_nodes.value, n_order.value
        node_min = np.empty((m, 3), np.float32)
        node_max = np.empty((m, 3), np.float32)
        right = np.empty(m, np.int32)
        axis = np.empty(m, np.int32)
        first = np.empty(m, np.int32)
        count = np.empty(m, np.int32)
        order = np.empty(max(t, 1), np.int32)
        lib.crn_bvh_copy(h, _fptr(node_min), _fptr(node_max), _iptr(right),
                         _iptr(axis), _iptr(first), _iptr(count), _iptr(order))
        return node_min, node_max, right, axis, first, count, order[:t]
    finally:
        lib.crn_bvh_free(h)


SPLIT_MODES = {"median": 0, "sah": 1}


def _bvh_handle(lib, v0, v1, v2, leaf_size, split="median"):
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    h = lib.crn_build_bvh(_fptr(v0), _fptr(v1), _fptr(v2), v0.shape[0],
                          leaf_size, SPLIT_MODES[split])
    return h, v0, v1, v2


def build_bvh_fat_native(v0, v1, v2, leaf_size: int = 4,
                         split: str = "median"):
    """Binary-BVH fat rows [M, 8 + leaf_size*10], assembled entirely in C++
    (the numpy assembly runs at MB/s on the target host — see
    native/craynative.cpp fat-row comment). Returns None if unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "crn_bvh_fat"):
        return None
    h, v0, v1, v2 = _bvh_handle(lib, v0, v1, v2, leaf_size, split)
    if not h:
        return None
    try:
        n_nodes = ctypes.c_int64()
        n_order = ctypes.c_int64()
        lib.crn_bvh_counts(h, ctypes.byref(n_nodes), ctypes.byref(n_order))
        m = n_nodes.value
        fat = np.empty((m, 8 + leaf_size * 10), np.float32)
        r = lib.crn_bvh_fat(h, _fptr(v0), _fptr(v1), _fptr(v2), leaf_size,
                            _fptr(fat))
        return fat if r == m else None
    finally:
        lib.crn_bvh_free(h)


def build_bvh4_fat_native(v0, v1, v2, leaf_size: int = 4,
                          split: str = "median"):
    """4-wide (QBVH) fat rows [M, 28 + 4*leaf_size*10]: binary build +
    BFS grandchild collapse + fat assembly, all in C++ and bit-identical to
    accel/bvh4.py's numpy path. Returns None if unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "crn_bvh4_fat"):
        return None
    h, v0, v1, v2 = _bvh_handle(lib, v0, v1, v2, leaf_size, split)
    if not h:
        return None
    try:
        m = ctypes.c_int64()
        if lib.crn_bvh4_collapse(h, ctypes.byref(m)) != 0 or m.value <= 0:
            return None
        fat = np.empty((m.value, 28 + 4 * leaf_size * 10), np.float32)
        r = lib.crn_bvh4_fat(h, _fptr(v0), _fptr(v1), _fptr(v2), leaf_size,
                             _fptr(fat))
        return fat if r == m.value else None
    finally:
        lib.crn_bvh_free(h)
