"""Fused Burgers application as Pallas TPU kernels.

The dense-operator Burgers term res = nu * D2(x) - conv * D1(x) is the
dycore's hot loop (reference OPR_Burgers_X/Y/Z, opr_burgers.f90).  The
XLA path materializes the stacked [D1;D2] matmul output (2F fields) in
HBM, then re-reads it for the elementwise combine -- ~6F+1 field passes
per direction.  These kernels keep the (2n, tile) matmul product in
VMEM and write only the F-field result: ~2F+1 passes, a ~20% cut of the
step's total HBM traffic (the step is HBM-bound at ~95% of the XLA-
counted bytes roofline; see tools/roofline_check.py and PARITY.md).

One kernel per direction (the contraction axis determines the data
layout); each runs the [D1;D2] product on the MXU at the requested
precision (HIGH = 3-pass bf16 by default, ops/derivative.op_precision)
and the combine on the VPU before the result leaves VMEM.

Engaged from dycore._burgers_all for the plain convective form on TPU
f32 runs with lane-aligned shapes; every other configuration falls back
to the einsum path (TLAB_TPU_FUSED_BURGERS=0 disables).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(m: int, want=(512, 256, 128)) -> int:
    for t in want:
        if m % t == 0:
            return t
    return 0


def _dot(a, b, prec):
    """f32 MXU contraction (a dim 1 x b dim 0) at the requested
    precision.  Mosaic has no Precision.HIGH lowering, so the 3-pass
    bf16 split (what XLA's HIGH executes) is written out explicitly:
    hi*hi + hi*lo + lo*hi with f32 accumulation."""
    dims = (((1,), (0,)), ((), ()))
    if prec != "high":
        p = {"default": jax.lax.Precision.DEFAULT,
             "highest": jax.lax.Precision.HIGHEST}[prec]
        return jax.lax.dot_general(a, b, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32,
                                   precision=p)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def bdot(x, y):
        return jax.lax.dot_general(x, y, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32)

    return bdot(a_hi, b_hi) + bdot(a_hi, b_lo) + bdot(a_lo, b_hi)


def _kern_x(n, TJ, prec, nu_ref, d_ref, x_ref, c_ref, o_ref):
    f = pl.program_id(2)
    nu_f = nu_ref[f, 0]
    for j in range(TJ):                      # static unroll, 2-D dots
        h = _dot(d_ref[:], x_ref[0, :, j, :], prec)      # (2n, TK)
        o_ref[0, :, j, :] = (nu_f * h[n:]
                             - c_ref[:, j, :] * h[:n]).astype(o_ref.dtype)


def _kern_y(ny, TI, TK, prec, nu_ref, d_ref, x_ref, c_ref, o_ref):
    f = pl.program_id(2)
    nu_f = nu_ref[f, 0]
    for i in range(TI):                      # static unroll over x rows
        h = _dot(d_ref[:], x_ref[0, i], prec)
        o_ref[0, i] = (nu_f * h[ny:]
                       - c_ref[i] * h[:ny]).astype(o_ref.dtype)


def _kern_z(nz, TJ, prec, nu_ref, dt_ref, x_ref, c_ref, o_ref):
    f = pl.program_id(2)
    h = _dot(x_ref[0, 0], dt_ref[:], prec)
    nu_f = nu_ref[f, 0]
    o_ref[0, 0] = (nu_f * h[:, nz:] - c_ref[0] * h[:, :nz]
                   ).astype(o_ref.dtype)


def fused_burgers(d12, x, conv, nu, axis: int, prec_name: str = "high"):
    """res = nu * D2(x) - conv * D1(x) along spatial axis `axis` (0..2)
    of the stacked fields x (F, nx, ny, nz).

    d12: (2n, n) stacked [D1; D2] operator for that direction;
    conv: (nx, ny, nz) advecting velocity; nu: (F,) per-field
    diffusivity.  Returns (F, nx, ny, nz)."""
    prec = prec_name
    F, nx, ny, nz = x.shape
    nu2 = nu.reshape(F, 1).astype(jnp.float32)
    if axis == 0:
        # 4-D blocks, contraction along nx with 2-D dots per y-row:
        # merging (ny, nz) into one dim via jnp.reshape is NOT free
        # under TPU tiled layouts (a materialized 537 MB relayout per
        # call at the bench size), so the kernel keeps the dims apart
        n = nx
        TJ = _pick_tile(ny, (8,))
        TK = _pick_tile(nz, (128,))
        out = pl.pallas_call(
            functools.partial(_kern_x, n, TJ, prec),
            grid=(ny // TJ, nz // TK, F),
            in_specs=[
                pl.BlockSpec((F, 1), lambda j, k, f: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((2 * n, n), lambda j, k, f: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, TJ, TK), lambda j, k, f: (f, 0, j, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, TJ, TK), lambda j, k, f: (0, j, k),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, n, TJ, TK),
                                   lambda j, k, f: (f, 0, j, k),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((F, nx, ny, nz), x.dtype),
        )(nu2, d12, x, conv)
        return out
    if axis == 1:
        import os
        TK = _pick_tile(nz, (256, 128))
        # 4 x-rows per grid step (in-kernel unrolled dots): fewer grid
        # steps amortize the pipeline; measured 42.6 -> 42.2 ms/substep
        # at the bench size (r5 sweep over 1/2/4)
        TI = int(os.environ.get("TLAB_TPU_PB_TI", "4"))
        if nx % TI:
            TI = 1
        return pl.pallas_call(
            functools.partial(_kern_y, ny, TI, TK, prec),
            grid=(nx // TI, nz // TK, F),
            in_specs=[
                pl.BlockSpec((F, 1), lambda i, k, f: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((2 * ny, ny), lambda i, k, f: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TI, ny, TK),
                             lambda i, k, f: (f, i, 0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TI, ny, TK), lambda i, k, f: (i, 0, k),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TI, ny, TK),
                                   lambda i, k, f: (f, i, 0, k),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((F, nx, ny, nz), x.dtype),
        )(nu2, d12, x, conv)
    # axis == 2: contract the minor (lane) dim via x @ D^T
    TJ = _pick_tile(ny, (256, 128, 64, 32, 16, 8))
    dt = d12.T                        # (nz, 2 nz)
    return pl.pallas_call(
        functools.partial(_kern_z, nz, TJ, prec),
        grid=(nx, ny // TJ, F),
        in_specs=[
            pl.BlockSpec((F, 1), lambda i, j, f: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nz, 2 * nz), lambda i, j, f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TJ, nz), lambda i, j, f: (f, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TJ, nz), lambda i, j, f: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TJ, nz),
                               lambda i, j, f: (f, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, nx, ny, nz), x.dtype),
    )(nu2, dt, x, conv)


def usable(x_shape, axis: int, dtype) -> bool:
    """Shape/dtype gate: TPU f32/bf16 stacks with lane-aligned tiles
    (everything else falls back to the einsum path)."""
    if jnp.dtype(dtype) not in (jnp.float32, jnp.bfloat16):
        return False
    F, nx, ny, nz = x_shape
    n = (nx, ny, nz)[axis]
    if 2 * n * n * 4 > 4 * 1024 * 1024:
        return False            # [D1;D2] block must stay small in VMEM
    if axis == 0:
        return nx % 8 == 0 and ny % 8 == 0 and nz % 128 == 0
    if axis == 1:
        return ny % 8 == 0 and _pick_tile(nz, (256, 128)) > 0
    return (nz % 128 == 0
            and _pick_tile(ny, (256, 128, 64, 32, 16, 8)) > 0)
