"""ctypes bindings for the native host library (native/fmf_host.cpp).

Accelerates the host-side sequential inner loops (PAV, Lawson-Hanson NNLS)
that the reference leaves to Python/scipy. Callers treat this module as
optional: ImportError here routes them to the numpy/scipy fallbacks.

Build: ``make -C native`` at the repo root (or `python -m
functionalmf_tpu.utils.native` builds it in place).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_NATIVE_DIR = os.path.normpath(os.path.join(_HERE, "..", "..", "native"))
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfmf_host.so")


def build(force: bool = False) -> str:
    """Compile the native library in place; returns the .so path."""
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    return _LIB_PATH


def _load():
    if not os.path.exists(_LIB_PATH):
        try:
            build()
        except Exception as e:  # no toolchain / sandbox: fall back
            raise ImportError(f"native library unavailable: {e}") from e
    lib = ctypes.CDLL(_LIB_PATH)
    c_dp = ctypes.POINTER(ctypes.c_double)
    lib.fmf_pav.argtypes = [c_dp, c_dp, ctypes.c_long]
    lib.fmf_pav.restype = ctypes.c_int
    lib.fmf_pav_weighted.argtypes = [c_dp, c_dp, c_dp, ctypes.c_long]
    lib.fmf_pav_weighted.restype = ctypes.c_int
    lib.fmf_nnls.argtypes = [c_dp, ctypes.c_long, ctypes.c_long, c_dp, c_dp]
    lib.fmf_nnls.restype = ctypes.c_int
    lib.fmf_nnls_batch.argtypes = [c_dp, ctypes.c_long, ctypes.c_long, c_dp,
                                   ctypes.c_long, c_dp]
    lib.fmf_nnls_batch.restype = ctypes.c_int
    lib.fmf_nnls_gram.argtypes = [c_dp, c_dp, ctypes.c_long, c_dp]
    lib.fmf_nnls_gram.restype = ctypes.c_int
    lib.fmf_nnls_gram_batch.argtypes = [c_dp, c_dp, ctypes.c_long,
                                        ctypes.c_long, c_dp]
    lib.fmf_nnls_gram_batch.restype = ctypes.c_int
    return lib


_lib = _load()
_DP = ctypes.POINTER(ctypes.c_double)


def _ptr(a):
    return a.ctypes.data_as(_DP)


def pav(y):
    """Monotone-increasing PAV (matches reference utils.py:458-492)."""
    y = np.ascontiguousarray(y, dtype=np.float64)
    out = np.empty_like(y)
    rc = _lib.fmf_pav(_ptr(y), _ptr(out), y.shape[0])
    if rc != 0:
        raise RuntimeError(f"fmf_pav failed: {rc}")
    return out


def pav_weighted(y, w):
    y = np.ascontiguousarray(y, dtype=np.float64)
    w = np.ascontiguousarray(w, dtype=np.float64)
    out = np.empty_like(y)
    rc = _lib.fmf_pav_weighted(_ptr(y), _ptr(w), _ptr(out), y.shape[0])
    if rc != 0:
        raise RuntimeError(f"fmf_pav_weighted failed: {rc}")
    return out


def nnls(A, b):
    """min ||A x - b||, x >= 0 (Lawson-Hanson). Returns x."""
    A = np.ascontiguousarray(A, dtype=np.float64)
    b = np.ascontiguousarray(b, dtype=np.float64)
    m, n = A.shape
    x = np.zeros(n)
    rc = _lib.fmf_nnls(_ptr(A), m, n, _ptr(b), _ptr(x))
    if rc < 0:
        raise RuntimeError(f"fmf_nnls failed: {rc}")
    return x


def nnls_batch(A, B):
    """Batched NNLS sharing one design: B is (nb, m); returns (nb, n)."""
    A = np.ascontiguousarray(A, dtype=np.float64)
    B = np.ascontiguousarray(B, dtype=np.float64)
    m, n = A.shape
    nb = B.shape[0]
    X = np.zeros((nb, n))
    rc = _lib.fmf_nnls_batch(_ptr(A), m, n, _ptr(B), nb, _ptr(X))
    if rc < 0:
        raise RuntimeError(f"fmf_nnls_batch failed: {rc}")
    return X


def nnls_gram(G, f):
    """Gram-form NNLS: argmin_{x>=0} 1/2 x'Gx - f'x for one (n, n) Gram."""
    G = np.ascontiguousarray(G, dtype=np.float64)
    f = np.ascontiguousarray(f, dtype=np.float64)
    n = f.shape[0]
    x = np.zeros(n)
    rc = _lib.fmf_nnls_gram(_ptr(G), _ptr(f), n, _ptr(x))
    if rc < 0:
        raise RuntimeError(f"fmf_nnls_gram failed: {rc}")
    return x


def nnls_gram_batch(G, F):
    """Batched Gram-form NNLS: G (nb, n, n), F (nb, n) -> X (nb, n).

    The tensor-NMF inner solver: masked per-cell least squares reduce to
    k x k Grams assembled by one einsum (utils/nmf.py)."""
    G = np.ascontiguousarray(G, dtype=np.float64)
    F = np.ascontiguousarray(F, dtype=np.float64)
    nb, n = F.shape
    X = np.zeros((nb, n))
    rc = _lib.fmf_nnls_gram_batch(_ptr(G), _ptr(F), n, nb, _ptr(X))
    if rc < 0:
        raise RuntimeError(f"fmf_nnls_gram_batch failed: {rc}")
    return X


if __name__ == "__main__":
    print(build(force=True))
