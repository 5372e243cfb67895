"""ctypes bindings for the C++ f64 verification oracle (native/).

The oracle evaluates the exact softened potential / accelerations in f64
for drift measurement and kernel verification at sizes where numpy's
chunked path would allocate multi-GB temporaries. Falls back to numpy
transparently when the shared library hasn't been built (``make -C
native``); ``HAVE_NATIVE`` reports which path is active.
"""
from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = ["HAVE_NATIVE", "potential_f64", "accelerations_f64"]

_LIB_PATH = Path(__file__).resolve().parent.parent.parent / "native" / "libnbody_ref.so"
_lib: Optional[ctypes.CDLL] = None

if not _LIB_PATH.exists() and _LIB_PATH.parent.exists():
    # best-effort one-time build (the binary is not checked in)
    import subprocess

    subprocess.run(["make", "-C", str(_LIB_PATH.parent)],
                   capture_output=True, check=False)

if _LIB_PATH.exists():
    try:
        _lib = ctypes.CDLL(str(_LIB_PATH))
        _lib.nbody_potential.restype = ctypes.c_double
        _lib.nbody_potential.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_double, ctypes.c_double,
        ]
        _lib.nbody_accelerations.restype = None
        _lib.nbody_accelerations.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
        ]
    except OSError:
        _lib = None

HAVE_NATIVE = _lib is not None


def _as_c(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def potential_f64(pos: np.ndarray, mass: np.ndarray, eps2: float,
                  G: float = 1.0) -> float:
    """Exact softened pairwise potential (each pair once), f64."""
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    mass = np.ascontiguousarray(mass, dtype=np.float64)
    n = len(mass)
    if _lib is not None:
        return float(_lib.nbody_potential(_as_c(pos), _as_c(mass), n,
                                          float(eps2), float(G)))
    # numpy fallback, row-chunked per-coordinate (no [N,N,3] temporaries)
    U = 0.0
    chunk = max(1, min(n, 2**24 // max(n, 1)))
    x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        dx = x[None, :] - x[s:e, None]
        dy = y[None, :] - y[s:e, None]
        dz = z[None, :] - z[s:e, None]
        r2 = dx * dx + dy * dy + dz * dz + eps2
        inv = 1.0 / np.sqrt(r2)
        rows = np.arange(s, e)
        inv[rows - s, rows] = 0.0
        U += -0.5 * G * float(np.sum(mass[s:e, None] * mass[None, :] * inv))
    return U


def accelerations_f64(pos: np.ndarray, mass: np.ndarray, eps2: float,
                      G: float = 1.0) -> np.ndarray:
    """Exact softened accelerations [N, 3], f64."""
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    mass = np.ascontiguousarray(mass, dtype=np.float64)
    n = len(mass)
    if _lib is not None:
        acc = np.empty((n, 3), dtype=np.float64)
        _lib.nbody_accelerations(_as_c(pos), _as_c(mass), n, float(eps2),
                                 float(G), _as_c(acc))
        return acc
    acc = np.zeros((n, 3))
    x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
    chunk = max(1, min(n, 2**24 // max(n, 1)))
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        dx = x[None, :] - x[s:e, None]
        dy = y[None, :] - y[s:e, None]
        dz = z[None, :] - z[s:e, None]
        r2 = dx * dx + dy * dy + dz * dz + eps2
        inv = 1.0 / np.sqrt(r2)
        rows = np.arange(s, e)
        inv[rows - s, rows] = 0.0
        w = mass[None, :] * inv**3
        acc[s:e, 0] = np.sum(w * dx, axis=1)
        acc[s:e, 1] = np.sum(w * dy, axis=1)
        acc[s:e, 2] = np.sum(w * dz, axis=1)
    return G * acc
