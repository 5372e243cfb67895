"""Host-side Kepler equation solver (vectorized Newton-Raphson).

Matches the reference solver's semantics (reference: core/physics.py:43-71):
solve M = E - e*sin(E) for the eccentric anomaly E with a Newton iteration,
initial guess E=M for e < 0.8 and E=pi otherwise, tol=1e-12, max_iter=50.

Unlike the reference (scalar ``math``-based loop), this implementation is
vectorized over numpy arrays so an entire element table converts to state
vectors in one shot before being compiled into device state. A jittable
on-device version lives in ``orbital_tpu.ops.kepler``.
"""
from __future__ import annotations

import numpy as np

__all__ = ["solve_kepler"]


def solve_kepler(M, e, tol: float = 1e-12, max_iter: int = 50):
    """Solve Kepler's equation M = E - e*sin(E) for E (elliptic orbits).

    Args:
        M: mean anomaly in radians (scalar or array).
        e: eccentricity in [0, 1) (scalar or array, broadcastable with M).
        tol: convergence tolerance on the Newton update.
        max_iter: maximum Newton iterations.

    Returns:
        The eccentric anomaly E in radians, same shape as broadcast(M, e).
        Returns a Python float when both inputs are scalars.
    """
    M_arr = np.asarray(M, dtype=np.float64)
    e_arr = np.asarray(e, dtype=np.float64)
    scalar = M_arr.ndim == 0 and e_arr.ndim == 0

    M_b, e_b = np.broadcast_arrays(M_arr, e_arr)
    # Initial guess: E = M for near-circular orbits, pi otherwise
    # (reference: core/physics.py:62).
    E = np.where(e_b < 0.8, M_b, np.pi).astype(np.float64)

    active = np.ones(E.shape, dtype=bool)
    for _ in range(max_iter):
        f = E - e_b * np.sin(E) - M_b
        fp = 1.0 - e_b * np.cos(E)
        dE = -f / fp
        E = np.where(active, E + dE, E)
        active = active & (np.abs(dE) >= tol)
        if not active.any():
            break
    return float(E) if scalar else E
