"""ctypes binding for the C++ scene-table packer (table_packer.cpp).

ops/pallas/render_kernel.py::pack_scene_tables calls ``pack`` here first
and falls back to the NumPy packer when the shared library hasn't been
compiled (python -m cudaraytracer_tpu.native.build).  The outputs are
bit-identical to the NumPy packer (tests/test_native.py enforces it).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libcrt_native.so")
_lib = None


ABI_VERSION = 4  # table layout (+ per-vertex attr rows, vattr flags)


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_LIB_PATH)
        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int)
        lib.crt_pack_tables.restype = ctypes.c_int
        lib.crt_pack_tables.argtypes = [
            fp, fp, fp, fp, ip, ip, fp, ip, ip, fp, fp, fp, fp,
            fp, fp, fp, fp, fp, fp,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            fp, fp, fp, fp, ip, ip, ip,
        ]
        _lib = lib
    return _lib


def available() -> bool:
    """True when the .so exists AND was built against the current table
    layout — a stale library would silently pack the old PACKC bit layout
    and corrupt every render, so version-gate instead of trusting it."""
    if not os.path.exists(_LIB_PATH):
        return False
    try:
        lib = _load()
        if not hasattr(lib, "crt_pack_abi_version"):
            return False
        return int(lib.crt_pack_abi_version()) == ABI_VERSION
    except (OSError, AttributeError):
        return False


def pack(center, size, edge1, edge2, ptype, mtype, mparam, textype, texid,
         albedo, albedo2, bmin, bmax, slot_ids,
         npad: int, cluster: int, super_: int, p_rows: int,
         uv0=None, uv1=None, uv2=None, vn0=None, vn1=None, vn2=None,
         with_uv: bool = False, with_vattrs: bool = False):
    """Fill (S, P, clusters, supers, prim_map, n_super) for the megakernel.

    All inputs are the ACTIVE-primitive arrays in scene-active order;
    ``slot_ids`` maps row -> scene slot for prim_map; ``edge1``/``edge2``
    are the triangle edge vectors (zeros for other primitive types).
    ``with_vattrs`` packs the per-vertex attr rows (quantized normals,
    plus uv0+deltas when ``with_uv``) from ``uv0..vn2``.
    """
    lib = _load()
    n = len(slot_ids)
    f32 = lambda a: np.ascontiguousarray(a, np.float32)
    i32 = lambda a: np.ascontiguousarray(a, np.int32)
    center, size, mparam = f32(center), f32(size), f32(mparam)
    edge1, edge2 = f32(edge1), f32(edge2)
    albedo, albedo2, bmin, bmax = f32(albedo), f32(albedo2), f32(bmin), f32(bmax)
    ptype, mtype, textype, texid, slot_ids = map(
        i32, (ptype, mtype, textype, texid, slot_ids))
    if with_vattrs:
        uv0, uv1, uv2 = f32(uv0), f32(uv1), f32(uv2)
        vn0, vn1, vn2 = f32(vn0), f32(vn1), f32(vn2)
    else:
        z2 = np.zeros((n, 2), np.float32)
        z3 = np.zeros((n, 3), np.float32)
        uv0 = uv1 = uv2 = z2
        vn0 = vn1 = vn2 = z3

    S = np.empty((16, npad), np.float32)
    P = np.empty((p_rows, npad), np.float32)
    clusters = np.empty((7, npad // cluster), np.float32)
    supers = np.empty((6, npad // (cluster * super_)), np.float32)
    prim_map = np.empty(npad, np.int32)
    n_super = np.zeros(1, np.int32)

    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    rc = lib.crt_pack_tables(
        center.ctypes.data_as(fp), size.ctypes.data_as(fp),
        edge1.ctypes.data_as(fp), edge2.ctypes.data_as(fp),
        ptype.ctypes.data_as(ip), mtype.ctypes.data_as(ip),
        mparam.ctypes.data_as(fp),
        textype.ctypes.data_as(ip), texid.ctypes.data_as(ip),
        albedo.ctypes.data_as(fp), albedo2.ctypes.data_as(fp),
        bmin.ctypes.data_as(fp), bmax.ctypes.data_as(fp),
        uv0.ctypes.data_as(fp), uv1.ctypes.data_as(fp),
        uv2.ctypes.data_as(fp),
        vn0.ctypes.data_as(fp), vn1.ctypes.data_as(fp),
        vn2.ctypes.data_as(fp),
        int(bool(with_uv)), int(bool(with_vattrs)),
        n, npad, cluster, super_, p_rows,
        S.ctypes.data_as(fp), P.ctypes.data_as(fp),
        clusters.ctypes.data_as(fp), supers.ctypes.data_as(fp),
        slot_ids.ctypes.data_as(ip), prim_map.ctypes.data_as(ip),
        n_super.ctypes.data_as(ip),
    )
    if rc != 0:
        raise RuntimeError(f"crt_pack_tables failed (rc={rc})")
    return S, P, clusters, supers, int(n_super[0]), prim_map
