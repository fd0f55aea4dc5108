"""ctypes binding for the C++ binned-SAH BVH builder.

models/bvh.py calls ``build`` here first and falls back to the NumPy
median-split builder when the shared library hasn't been compiled
(python -m cudaraytracer_tpu.native.build).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libcrt_native.so")
_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.crt_bvh_build.restype = ctypes.c_int
        lib.crt_bvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
    return _lib


def available() -> bool:
    return os.path.exists(_LIB_PATH)


def build(bmin: np.ndarray, bmax: np.ndarray, prim_ids: np.ndarray):
    """(node_min f32[M,3], node_max f32[M,3], node_prim i32[M], node_skip i32[M])."""
    lib = _load()
    n = len(prim_ids)
    bmin = np.ascontiguousarray(bmin, np.float32)
    bmax = np.ascontiguousarray(bmax, np.float32)
    prim_ids = np.ascontiguousarray(prim_ids, np.int32)
    m_cap = max(1, 2 * n - 1)
    node_min = np.empty((m_cap, 3), np.float32)
    node_max = np.empty((m_cap, 3), np.float32)
    node_prim = np.empty(m_cap, np.int32)
    node_skip = np.empty(m_cap, np.int32)

    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    m = lib.crt_bvh_build(
        bmin.ctypes.data_as(fp), bmax.ctypes.data_as(fp),
        prim_ids.ctypes.data_as(ip), n,
        node_min.ctypes.data_as(fp), node_max.ctypes.data_as(fp),
        node_prim.ctypes.data_as(ip), node_skip.ctypes.data_as(ip),
    )
    if m < 0:
        raise RuntimeError("crt_bvh_build failed")
    return node_min[:m], node_max[:m], node_prim[:m], node_skip[:m]
