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


def thomas_solve(factors, rhs, interpret=None):
    """Solve for all lines: rhs (m, N) -> u (m, N); factors from
    thomas_factor (device arrays shaped (1, N)). Arbitrary batch sizes:
    m is zero-padded up to the 128-lane tile (padding lanes solve the
    same system on zero data and are dropped)."""
    if interpret is None:
        # pallas TPU kernels need interpret mode on the CPU backend
        interpret = jax.default_backend() == "cpu"
    w, binv, c = factors
    m0, n = rhs.shape
    tile = 128
    pad = (-m0) % tile
    if pad:
        rhs = jnp.concatenate(
            [rhs, jnp.zeros((pad, n), rhs.dtype)], axis=0)
    m = m0 + pad
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
    return out.T[:m0]


def device_factors(a, b, c, dtype=jnp.float32):
    w, binv, cs = thomas_factor(np.asarray(a), np.asarray(b), np.asarray(c))
    return (jnp.asarray(w, dtype)[None, :],
            jnp.asarray(binv, dtype)[None, :],
            jnp.asarray(cs, dtype)[None, :])


# ---------------------------------------------------------------------------
# Production banded D1 path: B u via shifted diagonal adds + Thomas solve
# of A -- the O(N) alternative to the dense A^{-1}B matmul for very long
# lines. Selected by build_device_plans when the line length reaches
# TLAB_TPU_THOMAS_MIN_N (default 4096; dense wins below -- measured on
# TPU v5e at N=1024).
# ---------------------------------------------------------------------------

def banded_plan(A1: np.ndarray, B1: np.ndarray, dtype=jnp.float32,
                band: int = 3):
    """Factor the tridiagonal A and extract B's diagonals -band..band;
    rows with out-of-band entries (the biased boundary rows) are applied
    densely on top."""
    A1 = np.asarray(A1, np.float64)
    B1 = np.asarray(B1, np.float64)
    n = A1.shape[0]
    a = np.concatenate([[0.0], np.diagonal(A1, -1)])
    b = np.diagonal(A1).copy()
    c = np.concatenate([np.diagonal(A1, 1), [0.0]])
    factors = device_factors(a, b, c, dtype)

    diags = {}
    mask_in = np.zeros_like(B1, bool)
    for k in range(-band, band + 1):
        d = np.zeros(n)
        idx = np.arange(max(0, -k), min(n, n - k))
        d[idx] = B1[idx, idx + k]
        diags[k] = jnp.asarray(d, dtype)
        mask_in[idx, idx + k] = True
    resid = np.where(mask_in, 0.0, B1)
    rows = np.nonzero(np.abs(resid).sum(axis=1) > 0)[0]
    dense_rows = (jnp.asarray(rows, jnp.int32),
                  jnp.asarray(B1[rows], dtype)) if rows.size else None
    return {"factors": factors, "diags": diags, "dense_rows": dense_rows,
            "n": n, "band": band}


def banded_der1(plan: dict, u, axis: int):
    """D1 u along `axis` via banded matvec + Thomas solve; u any rank."""
    n = plan["n"]
    u_m = jnp.moveaxis(u, axis, -1)
    lead = u_m.shape[:-1]
    u2 = u_m.reshape(-1, n)

    rhs = jnp.zeros_like(u2)
    for k, d in plan["diags"].items():
        if k == 0:
            rhs = rhs + d[None, :] * u2
        elif k > 0:
            rhs = rhs.at[:, :n - k].add(d[None, :n - k] * u2[:, k:])
        else:
            rhs = rhs.at[:, -k:].add(d[None, -k:] * u2[:, :n + k])
    if plan["dense_rows"] is not None:
        idx, Brows = plan["dense_rows"]
        rhs = rhs.at[:, idx].set(u2 @ Brows.T)
    out = thomas_solve(plan["factors"], rhs)
    return jnp.moveaxis(out.reshape(*lead, n), -1, axis)
