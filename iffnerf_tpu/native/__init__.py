"""Native C++ extension: marching-cubes mesh extraction, loaded via ctypes.

Builds on first use (g++ is in the image); no pybind11 required.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libiffnerf_mc.so")
_LIB = None


def build(force: bool = False) -> str:
    src = os.path.join(_DIR, "marching_cubes.cpp")
    if force or not os.path.exists(_SO) or (
        os.path.getmtime(_SO) < os.path.getmtime(src)
    ):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, src],
            check=True,
        )
    return _SO


def _lib():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(build())
        lib.mc_run.restype = ctypes.c_void_p
        lib.mc_run.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.mc_copy.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.mc_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def marching_cubes_native(volume: np.ndarray, level: float):
    """volume [X, Y, Z] float32 -> (verts [V, 3] in index coords,
    faces [F, 3] int32)."""
    vol = np.ascontiguousarray(volume, dtype=np.float32)
    nx, ny, nz = vol.shape
    lib = _lib()
    nv = ctypes.c_int(0)
    nf = ctypes.c_int(0)
    handle = lib.mc_run(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz, ctypes.c_float(level),
        ctypes.byref(nv), ctypes.byref(nf),
    )
    try:
        verts = np.empty((nv.value, 3), np.float32)
        faces = np.empty((nf.value, 3), np.int32)
        if nv.value:
            lib.mc_copy(
                handle,
                verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
    finally:
        lib.mc_free(handle)
    return verts, faces
