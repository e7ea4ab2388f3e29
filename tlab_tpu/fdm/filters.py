"""Filter operators as dense matrices (reference src/filters/*).

All filters are line operators uf = F u along one direction; like the
derivatives they collapse to precomputed dense matrices applied on the MXU
(reference equivalents: FLT_C4 compact filter flt_compact.f90, FLT_E4/E6
explicit filters flt_explitic.f90, FLT_T1 top-hat flt_tophat.f90).

Construction is by polynomial-exactness conditions rather than a port of the
reference's closed-form nonuniform formulas: the compact C4 filter row at
node i satisfies
    sum_k c_k u(x_{i+k}) = u(x_i) + alpha (u(x_{i-1}) + u(x_{i+1}))
exactly for cubics, with the center weight pinned to a_c = (5+6 alpha)/8
(Lele 1992, C.2.4) -- the same conditions the reference's formulas encode.
"""
from __future__ import annotations

import numpy as np


def compact4_matrix(nodes: np.ndarray, alpha: float, periodic: bool) -> np.ndarray:
    """Dense F = A^-1 B for the 4th-order compact (alpha) filter.

    Boundary rows on bounded domains leave the two end points unfiltered
    (uf = u), the reference's BCS_ZERO-style closure.
    """
    n = nodes.shape[0]
    ac = (5.0 + 6.0 * alpha) / 8.0
    A = np.zeros((n, n))
    B = np.zeros((n, n))

    if periodic:
        a = ac
        b2 = 0.5 * (1.0 + 2.0 * alpha)
        c2 = -(1.0 - 2.0 * alpha) / 8.0
        for i in range(n):
            A[i, i] = 1.0
            A[i, (i - 1) % n] = alpha
            A[i, (i + 1) % n] = alpha
            B[i, i] = a
            B[i, (i - 1) % n] += 0.5 * b2
            B[i, (i + 1) % n] += 0.5 * b2
            B[i, (i - 2) % n] += 0.5 * c2
            B[i, (i + 2) % n] += 0.5 * c2
        return np.linalg.solve(A, B)

    # bounded: polynomial-exactness construction on the (possibly nonuniform)
    # 5-point stencil for interior rows; end rows pass through unchanged
    for i in range(n):
        A[i, i] = 1.0
        if i in (0, n - 1):
            B[i, i] = 1.0
            continue
        A[i, i - 1] = alpha
        A[i, i + 1] = alpha
        lo = max(0, min(i - 2, n - 5))
        stencil = np.arange(lo, lo + 5)
        xi = nodes[i]
        xs = nodes[stencil]
        M = np.zeros((5, 5))
        rhs = np.zeros(5)
        for m in range(4):
            M[m, :] = (xs - xi) ** m
            rhs[m] = (1.0 if m == 0 else 0.0) \
                + alpha * ((nodes[i - 1] - xi) ** m + (nodes[i + 1] - xi) ** m)
        M[4, :] = 0.0
        M[4, list(stencil).index(i)] = 1.0
        rhs[4] = ac
        B[i, stencil] = np.linalg.solve(M, rhs)
    return np.linalg.solve(A, B)


def explicit6_matrix(n: int, periodic: bool) -> np.ndarray:
    """6th-order explicit filter, stencil (1,-6,15,44,15,-6,1)/64
    (reference FLT_E6); end points pass through on bounded domains."""
    w = np.array([1.0, -6.0, 15.0, 44.0, 15.0, -6.0, 1.0]) / 64.0
    F = np.zeros((n, n))
    for i in range(n):
        if periodic:
            for k, c in zip(range(-3, 4), w):
                F[i, (i + k) % n] += c
        else:
            if 3 <= i <= n - 4:
                for k, c in zip(range(-3, 4), w):
                    F[i, i + k] += c
            elif i in (1, n - 2):          # 2nd-order at first interior points
                F[i, i - 1:i + 2] += np.array([1.0, 2.0, 1.0]) / 4.0
            elif i in (2, n - 3):          # 4th-order next
                F[i, i - 2:i + 3] += np.array([-1.0, 4.0, 10.0, 4.0, -1.0]) / 16.0
            else:
                F[i, i] = 1.0
    return F


def explicit4_matrix(nodes: np.ndarray, periodic: bool) -> np.ndarray:
    """4th-order explicit filter (vanishing 3rd moment), uniform stencil
    (-1,4,10,4,-1)/16 (reference FLT_E4)."""
    n = nodes.shape[0]
    w = np.array([-1.0, 4.0, 10.0, 4.0, -1.0]) / 16.0
    F = np.zeros((n, n))
    for i in range(n):
        if periodic:
            for k, c in zip(range(-2, 3), w):
                F[i, (i + k) % n] += c
        else:
            if 2 <= i <= n - 3:
                for k, c in zip(range(-2, 3), w):
                    F[i, i + k] += c
            elif i in (1, n - 2):
                F[i, i - 1:i + 2] += np.array([1.0, 2.0, 1.0]) / 4.0
            else:
                F[i, i] = 1.0
    return F


def tophat_matrix(nodes: np.ndarray, npts: int, periodic: bool) -> np.ndarray:
    """Conservative top-hat (moving average over npts+1 points, trapezoidal
    weights on nonuniform grids; reference FLT_T1, flt_tophat.f90)."""
    n = nodes.shape[0]
    half = npts // 2
    F = np.zeros((n, n))
    if periodic:
        h = nodes[1] - nodes[0] if n > 1 else 1.0
        w = np.ones(npts + 1)
        w[0] = w[-1] = 0.5
        w /= w.sum()
        for i in range(n):
            for k, c in zip(range(-half, half + 1), w):
                F[i, (i + k) % n] += c
    else:
        for i in range(n):
            lo = max(0, i - half)
            hi = min(n - 1, i + half)
            w = np.ones(hi - lo + 1)
            if w.size > 1:
                w[0] = w[-1] = 0.5
            w /= w.sum()
            F[i, lo:hi + 1] = w
    return F


def spectral_matrix_gain(mwn1_grid_units: np.ndarray, kind: str, params):
    """Gain per wavenumber for spectral cutoff/erf filters
    (reference opr_filter.f90 spectral band/erf)."""
    k = np.abs(mwn1_grid_units)
    if kind == "band":
        lo, hi = params[0], params[1]
        return ((k >= lo) & (k <= hi)).astype(float)
    if kind == "erf":
        import math
        erf = np.vectorize(math.erf)
        kc, delta = params[0], params[1]
        return 0.5 * (1.0 - erf((k - kc) / max(delta, 1e-30)))
    raise ValueError(kind)


def spectral_matrix(n: int, kind: str, params) -> np.ndarray:
    """Dense circulant filter matrix realizing a spectral gain G(k) on a
    periodic axis (reference opr_filter.f90 spectral band/erf applied in
    Fourier space; here one MXU matmul: M = F^-1 diag(G) F, real)."""
    k = np.arange(n // 2 + 1) * (2.0 * np.pi / n)   # grid-units wavenumber
    gain = spectral_matrix_gain(k, kind, params)
    row = np.fft.irfft(gain, n)
    M = np.empty((n, n))
    for i in range(n):
        M[i] = np.roll(row, i)
    return M
