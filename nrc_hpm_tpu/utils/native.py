"""ctypes bindings for the native IO runtime (native/libnrcio.so).

Loads lazily and degrades gracefully: if the shared library is absent (or
NRC_HPM_NATIVE=0), callers fall back to the pure-Python implementations.
Build with ``make -C native``.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("NRC_HPM_NATIVE", "1") == "0":
        return None
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(here, "native", "libnrcio.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.nrcio_vdb_load.restype = ctypes.c_int
    lib.nrcio_vdb_load.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.nrcio_last_error.restype = ctypes.c_char_p
    lib.nrcio_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _lib() is not None


def vdb_load_native(path: str):
    """Native VDB -> (dense [X,Y,Z] float32, bbox_min (3,), voxel_size).
    Returns None if the native library is unavailable; raises on parse
    errors so callers can fall back explicitly."""
    lib = _lib()
    if lib is None:
        return None
    data_ptr = ctypes.POINTER(ctypes.c_float)()
    dims = (ctypes.c_int64 * 3)()
    bbox_min = (ctypes.c_int32 * 3)()
    voxel = ctypes.c_double()
    rc = lib.nrcio_vdb_load(path.encode(), ctypes.byref(data_ptr), dims,
                            bbox_min, ctypes.byref(voxel))
    if rc != 0:
        raise ValueError(
            f"nrcio_vdb_load failed: {lib.nrcio_last_error().decode()}")
    shape = (dims[0], dims[1], dims[2])
    n = shape[0] * shape[1] * shape[2]
    arr = np.ctypeslib.as_array(data_ptr, shape=(n,)).reshape(shape).copy()
    lib.nrcio_free(data_ptr)
    return arr, np.array(bbox_min[:], np.int32), float(voxel.value)
