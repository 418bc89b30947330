"""Native (C++) runtime components, bound via ctypes.

The reference's engine core is C++17 (SURVEY.md §2 native-language note);
here the TPU compute path is JAX/Pallas and the *host-side* hot loops that
don't belong under XLA — topology construction, i.e. the binned-SAH BVH
build — are native C++.  The library auto-compiles on first use (g++ -O3)
and transparently falls back to the pure-numpy builder when no compiler is
available, so the framework stays runnable everywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "sah_builder.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_libmrt_native.so")


def _compile() -> str | None:
    """Build the shared library if missing/stale. Returns path or None."""
    try:
        if (
            os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)
        ):
            return _SO
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO, _SRC],
            check=True,
            capture_output=True,
        )
        return _SO
    except Exception:
        return None


def get_native_lib():
    """Load (compiling if needed) the native library, or None."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = _compile()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            # per-symbol binding: an older .so without the newer entry
            # points must not disable the whole native library
            try:
                lib.mrt_build_wide8_tables.restype = ctypes.c_int32
                lib.mrt_build_wide8_tables.argtypes = [
                    ctypes.c_int32,
                    np.ctypeslib.ndpointer(np.float32,
                                           flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.float32,
                                           flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                    ctypes.c_int32,
                    np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.float32,
                                           flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.float32,
                                           flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                ]
            except AttributeError:
                pass  # native_build_wide8_tables hasattr-guards this
            try:
                lib.mrt_build_bvh_aabbs.restype = ctypes.c_int32
                lib.mrt_build_bvh_aabbs.argtypes = [
                    ctypes.c_int32,
                    ctypes.c_int32,
                    np.ctypeslib.ndpointer(np.float32,
                                           flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.float32,
                                           flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.float32,
                                           flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.float32,
                                           flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.float32,
                                           flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                ]
            except AttributeError:
                pass  # native_build_bvh_aabbs hasattr-guards this
            lib.mrt_build_bvh.restype = ctypes.c_int32
            lib.mrt_build_bvh.argtypes = [
                ctypes.c_int32,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def _pad8_rows(entries: int) -> int:
    rows = -(-entries // 2)               # 2 entries per 128-lane row
    return max(-(-rows // 8) * 8, 8)      # sublane multiple


def native_build_wide8_tables(amin, amax, lf, cnt, t: int):
    """C++ 8-wide collapse + lane-packed gather-index emission.

    Mirrors kernels/wide.py's numpy path exactly (same FIFO order, same
    tie-breaks, same packed layout); at 1M tris the numpy staging writes
    take ~10s vs well under a second here.  Returns (node_idx,
    node_const, leaf_idx, leaf_const, leaf_first, leaf_count, nw,
    num_leaf) or None if native is unavailable.
    """
    lib = get_native_lib()
    if lib is None or not hasattr(lib, "mrt_build_wide8_tables"):
        return None
    m = int(amin.shape[0])
    amin = np.ascontiguousarray(amin, np.float32)
    amax = np.ascontiguousarray(amax, np.float32)
    lf = np.ascontiguousarray(lf, np.int32)
    cnt = np.ascontiguousarray(cnt, np.int32)
    num_internal = int((cnt == 0).sum())
    num_leaf = int((cnt > 0).sum())
    nw_cap = max(num_internal, 1) + 1      # num_wide upper bound
    nr_cap = _pad8_rows(nw_cap + 1)
    lr_pad = _pad8_rows(num_leaf + 1)
    node_idx = np.empty((nr_cap, 128), np.int32)
    node_const = np.empty(9 * nw_cap + 16, np.float32)
    leaf_idx = np.empty((lr_pad, 128), np.int32)
    leaf_const = np.empty(num_leaf + 1, np.float32)
    leaf_first = np.empty(num_leaf, np.int32)
    leaf_count = np.empty(num_leaf, np.int32)
    nw = lib.mrt_build_wide8_tables(
        m, amin, amax, lf, cnt, int(t),
        node_idx, node_const, leaf_idx, leaf_const, leaf_first, leaf_count,
    )
    if nw <= 0:
        return None
    num_wide = nw + 1
    return (
        node_idx[:_pad8_rows(num_wide)],
        node_const[: 9 * num_wide + 2],
        leaf_idx,
        leaf_const,
        leaf_first,
        leaf_count,
        int(nw),
        num_leaf,
    )


def native_build_bvh_aabbs(tri_min, tri_max, centroid, max_leaf: int):
    """C++ binned-SAH build over arbitrary primitive AABBs/centroids
    with a caller-chosen leaf threshold (the TLAS pair-tree path).

    Returns (node_min, node_max, left_first, count, depth, axis, order,
    num_nodes) or None if native is unavailable."""
    lib = get_native_lib()
    if lib is None or not hasattr(lib, "mrt_build_bvh_aabbs"):
        return None
    n = int(tri_min.shape[0])
    tri_min = np.ascontiguousarray(tri_min, np.float32)
    tri_max = np.ascontiguousarray(tri_max, np.float32)
    centroid = np.ascontiguousarray(centroid, np.float32)
    m = max(2 * n - 1, 1)
    node_min = np.empty((m, 3), np.float32)
    node_max = np.empty((m, 3), np.float32)
    left_first = np.zeros(m, np.int32)
    count = np.zeros(m, np.int32)
    depth = np.zeros(m, np.int32)
    axis = np.zeros(m, np.int32)
    order = np.zeros(n, np.int32)
    num = lib.mrt_build_bvh_aabbs(
        n, int(max_leaf), tri_min, tri_max, centroid,
        node_min, node_max, left_first, count, depth, axis, order,
    )
    if num <= 0:
        return None
    return (
        node_min[:num], node_max[:num], left_first[:num], count[:num],
        depth[:num], axis[:num], order, int(num),
    )


def native_build_bvh(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray):
    """Run the C++ binned-SAH build.

    Returns (node_min, node_max, left_first, count, depth, axis,
    tri_order, num_nodes) or None if the native library is unavailable.
    """
    lib = get_native_lib()
    if lib is None:
        return None
    n = int(v0.shape[0])
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    m = max(2 * n - 1, 1)
    node_min = np.empty((m, 3), np.float32)
    node_max = np.empty((m, 3), np.float32)
    left_first = np.zeros(m, np.int32)
    count = np.zeros(m, np.int32)
    depth = np.zeros(m, np.int32)
    axis = np.zeros(m, np.int32)
    tri_order = np.zeros(n, np.int32)
    num = lib.mrt_build_bvh(
        n, v0, v1, v2, node_min, node_max, left_first, count, depth,
        axis, tri_order,
    )
    if num <= 0:
        return None
    return (
        node_min[:num], node_max[:num], left_first[:num], count[:num],
        depth[:num], axis[:num], tri_order, int(num),
    )
