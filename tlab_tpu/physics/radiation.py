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
    type: str = "none"            # none | grayliquid | gray
    scalar: int = 0               # index of the heated scalar (h)
    ql_scalar: int = -1           # index of liquid-water scalar; -1 => diagnostic
    kappa: float = 1.0            # liquid mass absorption coefficient (nondim)
    kappa_v: float = 0.0          # vapor absorption (gray variant)
    kappa_g: float = 0.0          # background-gas absorption (gray variant)
    beta: float = 1.0             # emission scale (sigma T_ref^4 nondim)
    emissivity: float = 1.0       # surface emissivity (gray variant)
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


def infrared_gray_source(props: RadiationProps, y, a, b,
                         emissivity: float = 1.0, return_fluxes=False):
    """Gray two-stream RTE with emission (reference IR_RTE1_Incremental,
    radiation.f90:448-541): absorption field a(x,y,z), emission function
    b = sigma T^4 (already scaled); downward flux from F_top at ymax,
    upward flux from the surface (emissivity-mixed reflection); source
    S = a (F_up + F_down) - 2 a b.

    The level-to-level recurrences F(j) = T(j) (F(j+1) + E(j)) are linear
    scans along y (lax.scan over ny with (nx, nz)-vector carries).
    """
    import jax
    yv = jnp.asarray(y, a.dtype)
    dy = yv[1:] - yv[:-1]                            # (ny-1,)
    ab = a * b                                       # absorption * emission
    # optical depth from the bottom (trapezoid) and transmission factors
    tau_inc = 0.5 * (a[:, 1:, :] + a[:, :-1, :]) * dy[None, :, None]
    trans = jnp.exp(-tau_inc)                        # I_{j-1,j} (nx,ny-1,nz)

    # downward flux: F(ny-1) = flux_top;
    # F(j) = trans(j) (F(j+1) + 0.5 dy (ab(j)/trans(j) + ab(j+1)))
    emis_dn = 0.5 * dy[None, :, None] * (ab[:, :-1, :] / trans
                                         + ab[:, 1:, :])

    def down(carry, inp):
        tr, em = inp
        fd = tr * (carry + em)
        return fd, fd

    f_top = jnp.full_like(a[:, 0, :], props.flux_top)
    _, fd_scan = jax.lax.scan(
        down, f_top,
        (jnp.moveaxis(trans, 1, 0)[::-1], jnp.moveaxis(emis_dn, 1, 0)[::-1]))
    flux_dn = jnp.concatenate(
        [jnp.moveaxis(fd_scan[::-1], 0, 1), f_top[:, None, :]], axis=1)

    # bottom boundary: upward flux = eps b_sfc + (1-eps) reflected
    f_bot = emissivity * b[:, 0, :] + (1.0 - emissivity) * flux_dn[:, 0, :]
    emis_up = 0.5 * dy[None, :, None] * (ab[:, :-1, :]
                                         + ab[:, 1:, :] / trans)

    def up(carry, inp):
        tr, em = inp
        fu = tr * (carry + em)
        return fu, fu

    _, fu_scan = jax.lax.scan(
        up, f_bot, (jnp.moveaxis(trans, 1, 0), jnp.moveaxis(emis_up, 1, 0)))
    flux_up = jnp.concatenate(
        [f_bot[:, None, :], jnp.moveaxis(fu_scan, 0, 1)], axis=1)

    src = a * (flux_up + flux_dn) - 2.0 * ab
    if return_fluxes:
        return src, flux_dn, flux_up
    return src


def infrared_band_source(props: RadiationProps, y, a_bands, T,
                         beta_bands, emissivity: float = 1.0):
    """Multi-band RTE (reference TYPE_IR_BAND, radiation.f90:341): each band
    carries its own absorption field and a quadratic-in-T emission fraction
    b_band = beta T^4 (b0 + T (b1 + T b2)); band sources add."""
    src = None
    for a_b, (b0, b1, b2) in zip(a_bands, beta_bands):
        emis = props.beta * T ** 4 * (b0 + T * (b1 + T * b2))
        s = infrared_gray_source(props, y, a_b, emis,
                                 emissivity=emissivity)
        src = s if src is None else src + s
    return src
