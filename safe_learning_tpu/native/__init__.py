"""Native (C++) host-side components, loaded via ctypes.

The TPU compute path is JAX/XLA/Pallas; the pieces here are the
host-side algorithms that are inherently sequential (heap-ordered
traversals) and dominate in Python at large grid sizes. Each component
compiles on first use with the system ``g++`` and falls back to the
pure-Python implementation when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libfloodfill.so")
_LIB = None
_BUILD_FAILED = False


def _build():
    src = os.path.join(_DIR, "flood_fill.cpp")
    cmd = ["g++", "-O3", "-shared", "-fPIC", src, "-o", _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True)


def load_flood_fill():
    """Return the native flood-fill entry point, or None if unbuildable."""
    global _LIB, _BUILD_FAILED
    if _LIB is not None:
        return _LIB.lyapunov_flood_fill
    if _BUILD_FAILED:
        return None
    try:
        src = os.path.join(_DIR, "flood_fill.cpp")
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
            _build()
        _LIB = ctypes.CDLL(_LIB_PATH)
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        _BUILD_FAILED = True
        return None
    _LIB.lyapunov_flood_fill.restype = ctypes.c_int
    _LIB.lyapunov_flood_fill.argtypes = [
        ctypes.POINTER(ctypes.c_double),   # values
        ctypes.POINTER(ctypes.c_int64),    # shape
        ctypes.c_int,                      # ndim
        ctypes.c_int64,                    # init flat index
        ctypes.POINTER(ctypes.c_uint8),    # visited out
    ]
    return _LIB.lyapunov_flood_fill


def flood_fill(values, shape, init_index):
    """Run the native flood fill; returns the visited mask or None.

    Parameters
    ----------
    values : (nindex,) float array, C-order flat grid values
    shape : tuple of ints
    init_index : int, flat index of the seed node
    """
    fn = load_flood_fill()
    if fn is None:
        return None
    values = np.ascontiguousarray(values, dtype=np.float64).ravel()
    shape_arr = np.asarray(shape, dtype=np.int64)
    visited = np.zeros(values.size, dtype=np.uint8)
    status = fn(values.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                shape_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                int(len(shape_arr)), int(init_index),
                visited.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if status != 0:
        return None
    return visited.astype(bool).reshape(tuple(shape))
