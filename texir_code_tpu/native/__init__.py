"""Native (C++) host-side engines with a compile-on-first-use ctypes binding.

`load()` compiles texir_native.cpp with g++ once (cached next to the source)
and returns the library handle, or None when no toolchain is available —
every caller has a pure-numpy fallback, so the native layer is a pure
accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "texir_native.cpp")
_LIB = os.path.join(_DIR, "libtexir_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_LIB)) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _LIB],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.texir_build_bvh.restype = ctypes.c_int32
        lib.texir_build_bvh.argtypes = [
            f32p, ctypes.c_int32, i32p, ctypes.c_int32, ctypes.c_int32,
            f32p, f32p, i32p, i32p, i32p, f32p, f32p, f32p, i32p, i32p,
        ]
        lib.texir_bake_geometry.restype = None
        lib.texir_bake_geometry.argtypes = [
            f32p, ctypes.c_int32, i32p, ctypes.c_int32, f32p, f32p,
            ctypes.c_int32, f32p, f32p, u8p,
        ]
        _lib = lib
    except Exception as e:  # toolchain missing / compile failure → fallback
        print(f"[texir_native] native build unavailable ({e}); using numpy paths")
        _lib = None
    return _lib


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def build_bvh_native(vertices: np.ndarray, faces: np.ndarray, leaf_width: int = 4):
    """C++ SAH build → FlatBVH, or None if the native library is missing."""
    lib = load()
    if lib is None:
        return None
    from texir_code_tpu.geometry.bvh import FlatBVH

    verts = np.ascontiguousarray(vertices, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    nf = f.shape[0]
    cap_nodes = 2 * nf + 8
    cap_slots = cap_nodes * leaf_width
    aabb_min = np.empty((cap_nodes, 3), np.float32)
    aabb_max = np.empty((cap_nodes, 3), np.float32)
    miss = np.empty(cap_nodes, np.int32)
    leaf_start = np.empty(cap_nodes, np.int32)
    leaf_count = np.empty(cap_nodes, np.int32)
    tri_p0 = np.empty((cap_slots, 3), np.float32)
    tri_e1 = np.empty((cap_slots, 3), np.float32)
    tri_e2 = np.empty((cap_slots, 3), np.float32)
    tri_prim = np.empty(cap_slots, np.int32)
    packed = np.zeros(1, np.int32)

    n = lib.texir_build_bvh(
        _fp(verts), verts.shape[0], _ip(f), nf, leaf_width,
        _fp(aabb_min), _fp(aabb_max), _ip(miss), _ip(leaf_start),
        _ip(leaf_count), _fp(tri_p0), _fp(tri_e1), _fp(tri_e2),
        _ip(tri_prim), _ip(packed),
    )
    if n <= 0:
        return None
    m = int(packed[0])
    return FlatBVH(
        aabb_min=aabb_min[:n].copy(),
        aabb_max=aabb_max[:n].copy(),
        miss=miss[:n].copy(),
        leaf_start=leaf_start[:n].copy(),
        leaf_count=leaf_count[:n].copy(),
        tri_p0=tri_p0[:m].copy(),
        tri_e1=tri_e1[:m].copy(),
        tri_e2=tri_e2[:m].copy(),
        tri_prim=tri_prim[:m].copy(),
        leaf_width=leaf_width,
    )


def bake_geometry_native(mesh, res: int):
    """C++ texture-space geometry bake → GeometryTextures, or None."""
    lib = load()
    if lib is None:
        return None
    import ctypes as ct

    from texir_code_tpu.models.tracer_irt import GeometryTextures

    if mesh.vertex_normals is None:
        mesh.compute_vertex_normals()
    verts = np.ascontiguousarray(mesh.vertices, np.float32)
    faces = np.ascontiguousarray(mesh.faces, np.int32)
    vn = np.ascontiguousarray(mesh.vertex_normals, np.float32)
    tuv = np.ascontiguousarray(mesh.triangle_uvs(), np.float32)
    position = np.zeros((res * res, 3), np.float32)
    normal = np.zeros((res * res, 3), np.float32)
    valid = np.zeros(res * res, np.uint8)
    lib.texir_bake_geometry(
        _fp(verts), verts.shape[0], _ip(faces), faces.shape[0],
        _fp(vn), _fp(tuv), res, _fp(position), _fp(normal),
        valid.ctypes.data_as(ct.POINTER(ct.c_uint8)),
    )
    return GeometryTextures(
        position=position.reshape(res, res, 3),
        normal=normal.reshape(res, res, 3),
        valid=valid.reshape(res, res).astype(bool),
    )
