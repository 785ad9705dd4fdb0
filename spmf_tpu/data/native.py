"""ctypes bindings for the native fast-ingest library (fast_io.cpp).

Compiled on demand with g++ (cached next to the source); every entry point
falls back to numpy when the toolchain or the .so is unavailable, so the
package never hard-depends on the native build.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_SRC = os.path.join(_HERE, "fast_io.cpp")
_SO = os.path.join(_HERE, "libfastio.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_SO)
            lib.csv_parse.restype = ctypes.c_void_p
            lib.csv_parse.argtypes = [ctypes.c_char_p]
            lib.mtx_parse.restype = ctypes.c_void_p
            lib.mtx_parse.argtypes = [ctypes.c_char_p]
            for name in ("io_rows", "io_cols", "io_nnz"):
                getattr(lib, name).restype = ctypes.c_int64
                getattr(lib, name).argtypes = [ctypes.c_void_p]
            lib.io_copy_values.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
            lib.io_copy_coords.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p
            ]
            lib.io_free.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def load_csv(path: str, dtype=np.float64) -> np.ndarray:
    """Dense CSV -> (N, D) array; native parser with numpy fallback."""
    lib = _load()
    if lib is None:
        return np.loadtxt(path, delimiter=",", dtype=dtype, ndmin=2)
    h = lib.csv_parse(path.encode())
    if not h:
        return np.loadtxt(path, delimiter=",", dtype=dtype, ndmin=2)
    try:
        rows, cols = lib.io_rows(h), lib.io_cols(h)
        out = np.empty(rows * cols, np.float64)
        lib.io_copy_values(h, out.ctypes.data_as(ctypes.c_void_p))
        return out.reshape(rows, cols).astype(dtype, copy=False)
    finally:
        lib.io_free(h)


def _mmread_coo(path: str):
    from scipy.io import mmread

    m = mmread(path).tocoo()
    return (
        m.row.astype(np.int64),
        m.col.astype(np.int64),
        m.data.astype(np.float64),
        m.shape,
    )


def load_mtx_coo(path: str):
    """MatrixMarket coordinate file -> (rows, cols, values, shape)."""
    lib = _load()
    if lib is None:
        return _mmread_coo(path)
    h = lib.mtx_parse(path.encode())
    if not h:
        # native parser only handles 'coordinate real|integer general';
        # pattern/complex/symmetric files go to scipy
        return _mmread_coo(path)
    try:
        shape = (lib.io_rows(h), lib.io_cols(h))
        nnz = lib.io_nnz(h)
        vals = np.empty(nnz, np.float64)
        rows = np.empty(nnz, np.int64)
        cols = np.empty(nnz, np.int64)
        lib.io_copy_values(h, vals.ctypes.data_as(ctypes.c_void_p))
        lib.io_copy_coords(
            h,
            rows.ctypes.data_as(ctypes.c_void_p),
            cols.ctypes.data_as(ctypes.c_void_p),
        )
        return rows, cols, vals, shape
    finally:
        lib.io_free(h)
