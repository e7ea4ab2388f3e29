"""Infrared radiation: 1-D two-stream RTE along y
(reference src/physics/radiation.f90, gray-liquid formulation
IR_RTE1_OnlyLiquid:401-444).

Gray-liquid: bulk absorption a = kappa rho_bar q_l; optical depths are
cumulative integrals along y computed with precomputed integration matrices
(one matmul each); heating rate

    S(y) = a(y) [ F_top e^{-tau(y, top)} + F_bot e^{-tau(bot, y)} ]

added to the enthalpy-scalar tendency. The reference integrates tau with
its compact Int1 plans; here a trapezoidal cumulative matrix is used
(2nd order; upgrade path: compact integral operator).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RadiationProps:
    type: str = "none"            # none | grayliquid
    scalar: int = 0               # index of the heated scalar (h)
    ql_scalar: int = -1           # index of liquid-water scalar; -1 => diagnostic
    kappa: float = 1.0            # mass absorption coefficient (nondim)
    flux_top: float = 1.0         # downward flux at ymax
    flux_bottom: float = 0.0      # upward flux at ymin


def cumulative_matrices(y: np.ndarray):
    """(J_from_top, J_from_bottom): lower/upper triangular trapezoid
    integration matrices; (J_top @ a)[j] = int_{y_j}^{y_top} a dy."""
    ny = y.shape[0]
    dy = np.diff(y)
    Jb = np.zeros((ny, ny))
    for j in range(1, ny):
        Jb[j, :] = Jb[j - 1, :]
        Jb[j, j - 1] += 0.5 * dy[j - 1]
        Jb[j, j] += 0.5 * dy[j - 1]
    total = Jb[-1:, :]
    Jt = total - Jb               # int_y^top = int_bot^top - int_bot^y
    return Jt, Jb


def infrared_source(props: RadiationProps, Jt, Jb, ql, rho_bar):
    """Heating-rate field from liquid water (ql: (nx, ny, nz))."""
    a = props.kappa * ql * rho_bar[None, :, None]
    tau_top = jnp.einsum("ab,ibk->iak", Jt, a)
    src = a * (props.flux_top * jnp.exp(-tau_top))
    if abs(props.flux_bottom) > 0:
        tau_bot = jnp.einsum("ab,ibk->iak", Jb, a)
        src = src + a * props.flux_bottom * jnp.exp(-tau_bot)
    return src
