"""ctypes bindings to the native C++ runtime library (libmsomnative.so).

Builds on first import with g++ (no pybind11 in this image — plain C ABI).
Provides: fast .bas codec, an asynchronous snapshot writer (background
thread), and a batched tridiagonal eigensolver for the stretching matrix.
Falls back to the pure-NumPy implementations if the toolchain is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libmsomnative.so")
_SRC = os.path.join(_HERE, "basio.cpp")

_lib = None


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
           "-std=c++17", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Load (building if needed) the native library; returns None if the
    toolchain is unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
    except Exception:
        return None

    lib.bas_write.restype = ctypes.c_int
    lib.bas_write.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                              ctypes.c_int, ctypes.c_int, ctypes.c_double,
                              ctypes.c_double, ctypes.c_double]
    lib.bas_read.restype = ctypes.c_int
    lib.bas_read.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                             ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
    lib.bas_writer_create.restype = ctypes.c_void_p
    lib.bas_writer_submit.restype = ctypes.c_int
    lib.bas_writer_submit.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double]
    lib.bas_writer_flush.restype = ctypes.c_int
    lib.bas_writer_flush.argtypes = [ctypes.c_void_p]
    lib.bas_writer_destroy.argtypes = [ctypes.c_void_p]
    lib.eig_tridiag_batch.restype = ctypes.c_int
    lib.eig_tridiag_batch.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
    _lib = lib
    return lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def write_bas_native(path, field, L0, x0=0.0, y0=0.0):
    lib = load()
    f = np.ascontiguousarray(np.asarray(field, np.float32))
    if f.ndim == 2:
        f = f[None]
    nl, ny, nx = f.shape
    rc = lib.bas_write(path.encode(), _fptr(f), nl, nx, L0, x0, y0)
    if rc != 0:
        raise OSError(f"bas_write failed: {rc}")


def read_bas_native(path, nl_max=1000, n_hint=None):
    lib = load()
    if n_hint is None:
        with open(path, "rb") as fp:
            n_hint = int(np.fromfile(fp, np.float32, 1)[0])
    buf = np.empty((nl_max, n_hint, n_hint), np.float32)
    n_out = ctypes.c_int()
    nl = lib.bas_read(path.encode(), _fptr(buf), nl_max,
                      ctypes.byref(n_out))
    if nl < 0:
        raise OSError(f"bas_read failed: {nl}")
    return np.array(buf[:nl])


class AsyncBasWriter:
    """Background-thread snapshot writer: submissions return immediately;
    flush() blocks until all files are on disk."""

    def __init__(self):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._h = self._lib.bas_writer_create()

    def submit(self, path, field, L0, x0=0.0, y0=0.0):
        f = np.ascontiguousarray(np.asarray(field, np.float32))
        if f.ndim == 2:
            f = f[None]
        nl, _, n = f.shape
        return self._lib.bas_writer_submit(self._h, path.encode(), _fptr(f),
                                           nl, n, L0, x0, y0)

    def flush(self):
        return self._lib.bas_writer_flush(self._h)

    def close(self):
        if self._h:
            self._lib.bas_writer_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def eig_tridiag_batch(lower, diag, upper):
    """Batched tridiagonal eigensolve: inputs (nbatch, nl); returns
    (w ascending (nbatch, nl), vr (nbatch, nl, nl))."""
    lib = load()
    lo = np.ascontiguousarray(lower, np.float64)
    di = np.ascontiguousarray(diag, np.float64)
    up = np.ascontiguousarray(upper, np.float64)
    nbatch, nl = di.shape
    w = np.empty((nbatch, nl), np.float64)
    vr = np.empty((nbatch, nl, nl), np.float64)
    rc = lib.eig_tridiag_batch(_dptr(lo), _dptr(di), _dptr(up), nl, nbatch,
                               _dptr(w), _dptr(vr))
    if rc != 0:
        raise RuntimeError("eig_tridiag_batch failed")
    return w, vr
