"""Native (C++) IO acceleration with transparent numpy fallback.

The shared library is built on demand with the bundled Makefile (g++ is
part of the image; pybind11 is not, so the binding is plain ctypes).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libc2ray_io.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_HERE, "io_native.cpp")
    stale = (not os.path.exists(_LIB_PATH)
             or (os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)))
    if stale:
        try:
            subprocess.run(["make", "-s", "-B", "-C", _HERE], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            if not os.path.exists(_LIB_PATH):
                return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.read_cube_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float)]
        lib.read_cube_f32.restype = ctypes.c_int
        lib.write_cube_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        lib.write_cube_f32.restype = ctypes.c_int
        lib.read_source_catalog.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64]
        lib.read_source_catalog.restype = ctypes.c_int64
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def read_cube_f32(path: str, mesh, header: bool = True, conv: float = 1.0,
                  floor_val: float = 0.0) -> np.ndarray:
    """Read a Fortran-ordered stream cube into C order with fused unit
    conversion and empty-cell floor.  Falls back to numpy when the native
    library is unavailable."""
    lib = _load()
    n1, n2, n3 = (int(m) for m in mesh)
    if lib is not None:
        out = np.empty((n1, n2, n3), np.float32)
        rc = lib.read_cube_f32(
            path.encode(), n1, n2, n3, int(header), float(conv),
            float(floor_val),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc == 0:
            return out
        if rc == -5:
            raise ValueError(f"{path}: mesh header mismatch (expected {mesh})")
        # other errors: fall through to numpy for a clearer exception
    from ..utils.io_fortran import read_stream_cube

    raw = read_stream_cube(path, (n1, n2, n3), np.float32, header=header)
    out = raw.astype(np.float32) * np.float32(conv)
    out[raw <= 0.0] = floor_val
    return out


def read_source_catalog(path: str, ncols: int = 5) -> Optional[np.ndarray]:
    """Parse an ASCII source catalog (count line + one source per line)
    with the threaded native parser.  Returns None when the native
    library is unavailable (caller falls back to the python reader)."""
    lib = _load()
    if lib is None:
        return None
    try:
        with open(path) as f:
            n = int(f.readline().split()[0])
    except (OSError, ValueError, IndexError):
        return None
    out = np.zeros((n, ncols), np.float64)
    got = lib.read_source_catalog(
        path.encode(), ncols,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n)
    if got != n:
        return None
    return out


def write_cube_f32(path: str, data: np.ndarray, header: bool = True) -> None:
    lib = _load()
    a = np.ascontiguousarray(data, np.float32)
    if lib is not None:
        rc = lib.write_cube_f32(
            path.encode(), a.shape[0], a.shape[1], a.shape[2], int(header),
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc == 0:
            return
    from ..utils.io_fortran import write_stream_cube

    write_stream_cube(path, a, np.float32, header=header)
