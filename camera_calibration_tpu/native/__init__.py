"""Native (C++) host components, ctypes-bound with compile-on-demand.

The reference's host-hot paths are C++ (its DensifyMatches rasterizer and
the pattern-intensity oracle inside the detector loops); this package
provides the same components natively with automatic compilation via the
system toolchain and transparent NumPy fallbacks (`available()` gates
use).  The shared object is cached next to the sources.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "densify.cpp")
_SO = os.path.join(_DIR, f"_native_{sys.implementation.cache_tag}.so")

_lib = None
_tried = False


def _build():
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.densify_matches.restype = ctypes.c_long
        lib.densify_matches.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # corners_img
            ctypes.POINTER(ctypes.c_long),  # cells
            ctypes.c_long,  # n_squares
            ctypes.c_double,  # cell_len
            ctypes.POINTER(ctypes.c_double),  # r_kg
            ctypes.POINTER(ctypes.c_double),  # t_kg
            ctypes.c_long,  # bw
            ctypes.c_long,  # bh
            ctypes.c_double,  # scale_x
            ctypes.c_double,  # scale_y
            ctypes.POINTER(ctypes.c_double),  # pts
            ctypes.POINTER(ctypes.c_ubyte),  # valid
        ]
        lib.pattern_intensity.restype = None
        lib.pattern_intensity.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_long,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def densify_matches_native(corners_img, cells, cell_len, r_kg, t_kg,
                           bw, bh, scale_x, scale_y, pts, valid):
    """Rasterize squares into (pts, valid) buffers in place.

    corners_img: (n, 4, 2) float64; cells: (n, 2) int64; pts: (bh, bw, 3)
    float64 (NaN-initialized); valid: (bh, bw) uint8.
    Returns the number of newly written pixels.
    """
    lib = _load()
    corners_img = np.ascontiguousarray(corners_img, np.float64)
    cells = np.ascontiguousarray(cells, np.int64)
    r_kg = np.ascontiguousarray(r_kg, np.float64)
    t_kg = np.ascontiguousarray(t_kg, np.float64)
    assert pts.flags["C_CONTIGUOUS"] and valid.flags["C_CONTIGUOUS"]
    return lib.densify_matches(
        _ptr(corners_img, ctypes.c_double),
        _ptr(cells, ctypes.c_long),
        corners_img.shape[0],
        float(cell_len),
        _ptr(r_kg, ctypes.c_double),
        _ptr(t_kg, ctypes.c_double),
        int(bw), int(bh), float(scale_x), float(scale_y),
        _ptr(pts, ctypes.c_double),
        _ptr(valid, ctypes.c_ubyte),
    )


def pattern_intensity_native(positions, num_segments):
    """Vectorized star-pattern intensity (native)."""
    lib = _load()
    positions = np.ascontiguousarray(positions, np.float64)
    flat = positions.reshape(-1, 2)
    out = np.empty(flat.shape[0], np.float64)
    lib.pattern_intensity(
        _ptr(flat, ctypes.c_double), flat.shape[0], int(num_segments),
        _ptr(out, ctypes.c_double),
    )
    return out.reshape(positions.shape[:-1])
