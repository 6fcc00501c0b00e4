"""Native (C++) host runtime components, loaded via ctypes.

Built lazily with g++ on first import; every caller has a numpy
fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libvoxelslam_native.so")
_SRC = os.path.join(_DIR, "decoder.cpp")

_lib = None


def build(force: bool = False) -> bool:
    """Compile the shared library (g++ -O3). Returns success."""
    if os.path.exists(_SO) and not force:
        if os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return True
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def lib():
    """The loaded library, or None when unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not build():
        return None
    try:
        L = ctypes.CDLL(_SO)
        L.decode_points.restype = ctypes.c_int
        L.decode_points.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_int,
            ctypes.c_double, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_long,
        ]
        L.sort_by_offset.restype = ctypes.c_int
        L.sort_by_offset.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long
        ]
        L.voxel_reduce.restype = ctypes.c_int
        L.voxel_reduce.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
            ctypes.c_double, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_long,
        ]
        if hasattr(L, "voxel_reduce_auto"):
            L.voxel_reduce_auto.restype = ctypes.c_int
            L.voxel_reduce_auto.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
                ctypes.c_void_p,
            ]
        if hasattr(L, "voxel_centroid"):
            L.voxel_centroid.restype = ctypes.c_int
            L.voxel_centroid.argtypes = [
                ctypes.c_void_p, ctypes.c_long, ctypes.c_double,
                ctypes.c_void_p, ctypes.c_long,
            ]
        _lib = L
        return L
    except OSError:
        return None


def voxel_reduce(pts, offt, cell: float, max_out: int):
    """One representative point (nearest cell center) per `cell`-sized
    voxel; keeps each representative's own time offset.  Returns
    (pts', offt'), "overflow" when distinct cells exceed max_out
    (caller should coarsen the cell), or None when the native library
    is unavailable."""
    import numpy as np

    L = lib()
    if L is None:
        return None
    pts = np.ascontiguousarray(pts, np.float32)
    offt = np.ascontiguousarray(offt, np.float32)
    n = len(pts)
    out_xyz = np.empty((max_out, 3), np.float32)
    out_t = np.empty((max_out,), np.float32)
    m = L.voxel_reduce(
        pts.ctypes.data, offt.ctypes.data, n, float(cell),
        out_xyz.ctypes.data, out_t.ctypes.data, max_out,
    )
    if m < 0:
        return "overflow"
    return out_xyz[:m], out_t[:m]


def voxel_centroid(pts, cell: float, max_out: int):
    """Voxel-average (centroid) reduction — the host counterpart of
    the device `ops.downsample.voxel_average`, used to pre-reduce
    merged keyframe clouds so the per-keyframe loop program skips its
    device sort.  Returns the (m, 3) centroid array, "overflow" when
    distinct cells exceed max_out, or None when the native library is
    unavailable (callers keep the device downsample)."""
    import numpy as np

    L = lib()
    if L is None or not hasattr(L, "voxel_centroid"):
        return None
    pts = np.ascontiguousarray(pts, np.float32)
    out_xyz = np.empty((max_out, 3), np.float32)
    m = L.voxel_centroid(
        pts.ctypes.data, len(pts), float(cell),
        out_xyz.ctypes.data, max_out,
    )
    if m < 0:
        return "overflow"
    return out_xyz[:m]


def voxel_reduce_auto(pts, offt, cells, start: int, max_out: int):
    """Try `cells[start:]` coarsest-last inside one native call.
    Returns (pts', offt', cell_idx) with the first cell that fits, or
    None when the native library lacks the symbol / even the coarsest
    cell overflows (callers fall back)."""
    import numpy as np

    L = lib()
    if L is None or not hasattr(L, "voxel_reduce_auto"):
        return None
    pts = np.ascontiguousarray(pts, np.float32)
    offt = np.ascontiguousarray(offt, np.float32)
    cells = np.ascontiguousarray(cells, np.float64)
    out_xyz = np.empty((max_out, 3), np.float32)
    out_t = np.empty((max_out,), np.float32)
    out_m = np.zeros(1, np.int64)
    c = L.voxel_reduce_auto(
        pts.ctypes.data, offt.ctypes.data, len(pts),
        cells.ctypes.data, len(cells), int(start),
        out_xyz.ctypes.data, out_t.ctypes.data, max_out,
        out_m.ctypes.data,
    )
    if c < 0:
        return None
    m = int(out_m[0])
    return out_xyz[:m], out_t[:m], c
