"""Romberg integration on uniformly sampled integrands (host-side numpy).

Equivalent of the reference's precomputed-weight Romberg integrator
(/root/reference/romberg.f90: scalar_romberg / vector_romberg), used only
at initialization to build the SED and photoionization tables.  The
integrand must be sampled at 2^k + 1 uniformly spaced points.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


@lru_cache(maxsize=None)
def romberg_weights(n: int) -> np.ndarray:
    """Quadrature weights w with sum(w * y) * h ~= integral of y over [0, n*h].

    Built by Richardson extrapolation of nested trapezoid rules — the same
    scheme romberg.f90 encodes in its precomputed weight table.  `n` must
    be a power of two; returns n+1 weights for unit sample spacing.
    """
    if n <= 0 or (n & (n - 1)):
        raise ValueError(f"Romberg requires 2^k intervals, got {n}")
    k = int(np.log2(n))
    # T[j]: trapezoid-rule weights with 2^j intervals, expressed on the
    # fine grid of n+1 points.
    col = []
    for j in range(k + 1):
        step = n >> j
        w = np.zeros(n + 1)
        idx = np.arange(0, n + 1, step)
        w[idx] = step
        w[idx[0]] *= 0.5
        w[idx[-1]] *= 0.5
        col.append(w)
    # Richardson extrapolation columns: R[j,m] = (4^m R[j,m-1] - R[j-1,m-1])/(4^m-1)
    for m in range(1, k + 1):
        f = 4.0 ** m
        col = [(f * col[j] - col[j - 1]) / (f - 1.0) for j in range(1, len(col))]
    w = col[-1]
    w.setflags(write=False)
    return w


def scalar_romberg(y: np.ndarray, h: float) -> float:
    """Integrate samples y (len 2^k+1, spacing h). romberg.f90 scalar_romberg."""
    w = romberg_weights(len(y) - 1)
    return float(np.dot(w, y) * h)


def vector_romberg(y: np.ndarray, h: float, axis: int = 0) -> np.ndarray:
    """Integrate along `axis` of y (size 2^k+1 along it), spacing h.

    romberg.f90 vector_romberg: used to integrate the (freq, tau) integrand
    arrays over frequency for every tau entry at once.
    """
    w = romberg_weights(y.shape[axis] - 1)
    return np.tensordot(w, np.moveaxis(y, axis, 0), axes=(0, 0)) * h
