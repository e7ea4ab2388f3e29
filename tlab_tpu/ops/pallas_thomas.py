"""Pallas TPU kernel: batched pre-factorized tridiagonal (Thomas) solve.

The dense-operator formulation (fdm/plan.py) applies compact schemes as
N x N matmuls -- optimal on the MXU for moderate line lengths (N <~ 1-2k,
where 2N flops/point rides the systolic array faster than memory).  For very
long lines the O(N) Thomas recurrence wins; this kernel provides that
backend: lines ride the 128 lanes, the recurrence marches along sublanes,
with the LU factors precomputed on the host (the same split as the
reference's TRIDFS/TRIDSS pair, src/utils/linear3.f90:29-56).

Layout: rhs (m, N) with m = batch of independent lines; grid tiles m by 128.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def thomas_factor(a: np.ndarray, b: np.ndarray, c: np.ndarray):
    """Host-side LU factorization of a shared tridiagonal system.

    Returns (w, binv, c): forward multipliers, inverted pivots, superdiag.
    """
    n = b.shape[0]
    w = np.zeros(n)
    bp = b.astype(np.float64).copy()
    for i in range(1, n):
        w[i] = a[i] / bp[i - 1]
        bp[i] = b[i] - w[i] * c[i - 1]
    return w, 1.0 / bp, c.astype(np.float64)


def _thomas_kernel(w_ref, binv_ref, c_ref, d_ref, out_ref, *, n):
    # forward elimination: d_i -= w_i d_{i-1}
    def fwd(i, _):
        out_ref[i, :] = d_ref[i, :] - w_ref[0, i] * out_ref[i - 1, :]
        return 0

    out_ref[0, :] = d_ref[0, :]
    jax.lax.fori_loop(1, n, fwd, 0)

    # back substitution: u_i = (d'_i - c_i u_{i+1}) / b'_i
    out_ref[n - 1, :] = out_ref[n - 1, :] * binv_ref[0, n - 1]

    def bwd(k, _):
        i = n - 2 - k
        out_ref[i, :] = (out_ref[i, :]
                         - c_ref[0, i] * out_ref[i + 1, :]) * binv_ref[0, i]
        return 0

    jax.lax.fori_loop(0, n - 1, bwd, 0)


def thomas_solve(factors, rhs, interpret: bool = False):
    """Solve for all lines: rhs (m, N) -> u (m, N); factors from
    thomas_factor (device arrays shaped (1, N))."""
    w, binv, c = factors
    m, n = rhs.shape
    tile = 128
    assert m % tile == 0, "batch must be a multiple of 128 lanes"
    rhs_t = rhs.T                                   # (N, m): lines in lanes

    out = pl.pallas_call(
        functools.partial(_thomas_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((n, m), rhs.dtype),
        grid=(m // tile,),
        in_specs=[
            # factors are read as dynamic scalars inside the recurrence ->
            # SMEM (VMEM lane-dim dynamic indexing is not expressible)
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(w, binv, c, rhs_t)
    return out.T


def device_factors(a, b, c, dtype=jnp.float32):
    w, binv, cs = thomas_factor(np.asarray(a), np.asarray(b), np.asarray(c))
    return (jnp.asarray(w, dtype)[None, :],
            jnp.asarray(binv, dtype)[None, :],
            jnp.asarray(cs, dtype)[None, :])
