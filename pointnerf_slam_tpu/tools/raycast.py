"""ctypes wrapper for the native BVH mesh ray-caster (native/raycast.cpp)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    lib_path = os.path.join(_NATIVE_DIR, "libraycast.so")
    if not os.path.exists(lib_path):
        subprocess.run(["make", "-C", _NATIVE_DIR, "libraycast.so"],
                       check=True, capture_output=True)
    lib = ctypes.CDLL(lib_path)
    lib.rc_build.restype = ctypes.c_void_p
    lib.rc_build.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                             ctypes.POINTER(ctypes.c_long), ctypes.c_long]
    lib.rc_cast.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_float),
                            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                            ctypes.POINTER(ctypes.c_float)]
    lib.rc_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


class MeshRaycaster:
    """First-hit ray parameter t for batches of rays against a triangle
    mesh; t = -1 on miss."""

    def __init__(self, verts: np.ndarray, tris: np.ndarray):
        lib = _load()
        self._verts = np.ascontiguousarray(verts, np.float32)
        self._tris = np.ascontiguousarray(tris, np.int64)
        self._h = lib.rc_build(
            self._verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(self._verts),
            self._tris.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            len(self._tris))

    def cast(self, origins: np.ndarray, dirs: np.ndarray) -> np.ndarray:
        o = np.ascontiguousarray(origins, np.float32)
        d = np.ascontiguousarray(dirs, np.float32)
        n = len(o)
        out = np.empty((n,), np.float32)
        _load().rc_cast(self._h,
                        o.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out

    def __del__(self):
        try:
            _load().rc_free(self._h)
        except Exception:
            pass
