"""Characteristic (NSCBC) boundary conditions for the compressible core
(Poinsot & Lele, JCP 1992; reference src/tools/dns/
boundary_bcs_compressible.f90).

At an open y-boundary the wall-row tendencies of the conservative state are
replaced by the characteristic form: wave amplitudes L1..L5 are evaluated
with the compact one-sided derivative rows; outgoing waves keep their
interior values, incoming waves are modeled (non-reflecting outflow:
L_in = K (p - p_inf) with K = sigma (1 - M^2) c / L_y).

Nondimensional EOS as in dycore.compressible.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from tlab_tpu.dycore.compressible import CompState, primitive


@dataclasses.dataclass(frozen=True)
class NSCBCSpec:
    ymin: str = "wall"          # wall | outflow | inflow
    ymax: str = "wall"
    sigma: float = 0.25         # relaxation coefficient for incoming waves
    p_inf: float = 1.0          # far-field pressure (nondimensional units)


def _wall_row_derivs(P, a, side: int):
    """One-sided compact d/dy at the boundary row (row of the dense D1y)."""
    d1y = P["d1y"]
    row = d1y[0] if side == 0 else d1y[-1]
    return jnp.einsum("b,ibk->ik", row, a)


def characteristic_tendency(P, U: CompState, gamma: float, mach: float,
                            spec: NSCBCSpec, ly: float, side: int):
    """(drho, dru, drv, drw, drE) wall-row tendencies at y side (0/-1)."""
    rho_f = U.rho
    u, v, w, T, p = primitive(P, U, gamma, mach)
    c2 = T / mach ** 2
    c = jnp.sqrt(jnp.maximum(c2, 1e-12))

    # boundary-row values and one-sided normal derivatives
    j = 0 if side == 0 else -1
    rb = rho_f[:, j, :]
    ub = u[:, j, :]
    vb = v[:, j, :]
    wb = w[:, j, :]
    pb = p[:, j, :]
    cb = c[:, j, :]
    drho = _wall_row_derivs(P, rho_f, side)
    du = _wall_row_derivs(P, u, side)
    dv = _wall_row_derivs(P, v, side)
    dw = _wall_row_derivs(P, w, side)
    dp = _wall_row_derivs(P, p, side)

    L1 = (vb - cb) * (dp - rb * cb * dv)
    L2 = vb * (cb ** 2 * drho - dp)
    L3 = vb * du
    L4 = vb * dw
    L5 = (vb + cb) * (dp + rb * cb * dv)

    kind = spec.ymin if side == 0 else spec.ymax
    if kind == "outflow":
        # non-reflecting: model the single incoming acoustic wave
        K = spec.sigma * (1.0 - (mach * jnp.abs(vb) / cb) ** 2) * cb / ly
        incoming = K * (pb - spec.p_inf)
        if side == 0:                       # ymin: v+c wave enters
            L5 = incoming
        else:                               # ymax: v-c wave enters
            L1 = incoming
    elif kind == "inflow":
        # steady subsonic inflow: freeze entropy/tangential, reflect acoustic
        L2 = jnp.zeros_like(L2)
        L3 = jnp.zeros_like(L3)
        L4 = jnp.zeros_like(L4)
        if side == 0:
            L5 = L1
        else:
            L1 = L5

    d_coeff = (L2 + 0.5 * (L5 + L1)) / cb ** 2
    dvel = (L5 - L1) / (2.0 * rb * cb)
    dpres = 0.5 * (L5 + L1)

    drho_t = -d_coeff
    drv_t = -(vb * d_coeff + rb * dvel)
    dru_t = -(ub * d_coeff + rb * L3)
    drw_t = -(wb * d_coeff + rb * L4)
    # total-energy tendency (rho e = p/(gamma-1) in these units)
    ke = 0.5 * (ub ** 2 + vb ** 2 + wb ** 2)
    drE_t = -(ke * d_coeff
              + dpres / ((gamma - 1.0))
              + rb * (ub * L3 + vb * dvel + wb * L4))
    return drho_t, dru_t, drv_t, drw_t, drE_t


def apply_nscbc(P, U: CompState, h: CompState, gamma: float, mach: float,
                spec: NSCBCSpec, ly: float) -> CompState:
    """Replace wall-row tendencies by the characteristic form for open
    sides; 'wall' sides are left to the caller's solid-wall treatment."""
    comps = [h.rho, h.rhou, h.rhov, h.rhow, h.rhoE]
    for side in (0, -1):
        kind = spec.ymin if side == 0 else spec.ymax
        if kind == "wall":
            continue
        ct = characteristic_tendency(P, U, gamma, mach, spec, ly, side)
        j = 0 if side == 0 else -1
        comps = [c.at[:, j, :].set(t) for c, t in zip(comps, ct)]
    return CompState(*comps)
