"""ctypes bindings to the native host kernels (native/quflow_host.cpp).

Builds the shared library on first use if the toolchain is available
(g++ -fopenmp); everything degrades gracefully to the pure JAX/numpy path
when no compiler is present.  ``solve_poisson_native`` is the host-side
equivalent of the reference's numba cpu backend.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["available", "solve_poisson_native", "conj_subtract_native", "thomas_batch"]

_LIBNAME = "libquflow_host.so"
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_lib = None
_tried = False


def _build():
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = os.path.join(_NATIVE_DIR, _LIBNAME)
    if not os.path.exists(path):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None

    dptr = ctypes.POINTER(ctypes.c_double)
    i64 = ctypes.c_int64
    lib.thomas_batch_d.argtypes = [dptr, dptr, dptr, dptr, i64, i64, i64]
    lib.pack_diagh_z.argtypes = [ctypes.c_void_p, ctypes.c_void_p, i64]
    lib.unpack_diagh_z.argtypes = [ctypes.c_void_p, ctypes.c_void_p, i64]
    lib.conj_subtract_z.argtypes = [ctypes.c_void_p, i64]
    lib.solve_poisson_skewh_z.argtypes = [
        dptr, dptr, dptr, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, i64,
    ]
    lib.omp_thread_count.restype = ctypes.c_int
    _lib = lib
    return _lib


def available():
    return _load() is not None


def _as_dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def thomas_batch(w, binv, u, d):
    """Solve the prefactorized batched tridiagonal systems in place.
    d: (C, R, N) float64 (C channels, e.g. re/im)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    d = np.ascontiguousarray(d, dtype=np.float64)
    C, R, N = d.shape
    lib.thomas_batch_d(_as_dptr(w), _as_dptr(binv), _as_dptr(u), _as_dptr(d), C, R, N)
    return d


_factor_cache: dict = {}


def _factors64(N):
    if N not in _factor_cache:
        from .ops.laplacian import _factors

        fac = _factors(N, True, "poisson", ())
        _factor_cache[N] = (
            np.ascontiguousarray(fac.w, dtype=np.float64),
            np.ascontiguousarray(fac.binv, dtype=np.float64),
            np.ascontiguousarray(fac.u, dtype=np.float64),
        )
    return _factor_cache[N]


def solve_poisson_native(W):
    """Skew-Hermitian Poisson solve on the host (complex128)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    W = np.ascontiguousarray(W, dtype=np.complex128)
    N = W.shape[-1]
    w, binv, u = _factors64(N)
    P = np.zeros_like(W)
    scratch = np.empty(((N // 2 + 1) * N,), dtype=np.complex128)
    lib.solve_poisson_skewh_z(
        _as_dptr(w), _as_dptr(binv), _as_dptr(u),
        W.ctypes.data_as(ctypes.c_void_p),
        P.ctypes.data_as(ctypes.c_void_p),
        scratch.ctypes.data_as(ctypes.c_void_p),
        N,
    )
    return P


def conj_subtract_native(A):
    """In-place A <- A - A^H (complex128)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    A = np.ascontiguousarray(A, dtype=np.complex128)
    lib.conj_subtract_z(A.ctypes.data_as(ctypes.c_void_p), A.shape[-1])
    return A
