"""Derivative application: dense operator matmuls along one array axis.

On TPU a compact-FD derivative is a single MXU matmul with the precomputed
dense operator (see tlab_tpu.fdm.plan). This replaces the reference's
transpose -> banded matvec -> Thomas solve pipeline (src/operators/
opr_partial.f90:31-150) with one fused contraction that XLA shards and
schedules.

Convention: fields are (nx, ny, nz); `axis` selects the contraction
dimension. The operator matrix M has shape (m, n) and maps values on the n
source nodes to m output nodes (m == n for derivatives, m == 2n for the
fused [D1; D2] stack).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EINSUM = {
    0: "ab,bjk->ajk",
    1: "ab,ibk->iak",
    2: "ab,ijb->ija",
}

# 4-D variants (leading stacked-field axis, e.g. (ns, nx, ny, nz))
_EINSUM4 = {
    1: "ab,fbjk->fajk",
    2: "ab,fibk->fiak",
    3: "ab,fijb->fija",
}


_PRECISION_BY_NAME = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def op_precision(dtype):
    """Matmul precision for operator applications.

    TPU f32 matmuls default to one-pass bf16, which loses ~2 digits per
    derivative -- measured per-RK-step relative error vs float64:
    default 2.5e-2 (unusable), high (3-pass) 5.9e-5, highest (6-pass)
    8.8e-7.  HIGH is the production default: its 5.9e-5 per-step relative
    error sits ~20x below the compact-C6 spatial truncation error of a
    resolved DNS at production resolutions (k h ~ 1 modes carry O(1e-3)
    relative derivative error), and it runs the fused step ~1.25x faster
    (864x vs 675x the reference baseline, PARITY perf study).  Export
    TLAB_TPU_MATMUL_PRECISION=highest for f32 validation work against
    f64, or when running marginally-resolved spectra studies where the
    truncation floor is pushed below 1e-5.
    """
    if dtype in (jnp.float32,):
        import os
        name = os.environ.get("TLAB_TPU_MATMUL_PRECISION", "high").lower()
        return _PRECISION_BY_NAME.get(name, jax.lax.Precision.HIGHEST)
    return None


def apply_along(M, u, axis: int):
    """out = M @ u along `axis`, accumulating in f32 for low-precision inputs."""
    pref = jnp.float32 if u.dtype in (jnp.bfloat16, jnp.float16) else u.dtype
    eins = _EINSUM4[axis] if u.ndim == 4 else _EINSUM[axis]
    return jnp.einsum(eins, M, u, preferred_element_type=pref,
                      precision=op_precision(u.dtype)).astype(u.dtype)


def der1(plan_d1, u, axis: int):
    """First derivative along `axis`; plan_d1 = device matrix for the BC case."""
    return apply_along(plan_d1, u, axis)


def der2(plan_d2, u, axis: int):
    """Second derivative along `axis`."""
    return apply_along(plan_d2, u, axis)


def der12(plan_d12, u, axis: int):
    """Fused first+second derivative with the stacked (2n, n) operator.

    One matmul computes both derivatives (a single pass over u through the
    MXU), the hot pattern of the Burgers operator.
    """
    n = u.shape[axis]
    out = apply_along(plan_d12, u, axis)
    lo = [slice(None)] * u.ndim
    hi = [slice(None)] * u.ndim
    lo[axis] = slice(0, n)
    hi[axis] = slice(n, 2 * n)
    return out[tuple(lo)], out[tuple(hi)]
