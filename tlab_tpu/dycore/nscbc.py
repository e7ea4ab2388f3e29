"""Characteristic (NSCBC) boundary conditions for the compressible core
(Poinsot & Lele, JCP 1992; reference src/tools/dns/
boundary_bcs_compressible.f90, x- and y-direction variants).

At an open boundary the edge-row tendencies of the conservative state are
replaced by the characteristic form: wave amplitudes L1..L5 are evaluated
with the compact one-sided derivative rows; outgoing waves keep their
interior values, incoming waves are modeled (non-reflecting outflow:
L_in = K (p - p_inf) with K = sigma (1 - M^2) c / L).

Nondimensional EOS as in dycore.compressible.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from tlab_tpu.dycore.compressible import CompState, primitive


@dataclasses.dataclass(frozen=True)
class NSCBCSpec:
    ymin: str = "wall"          # wall | outflow | inflow (y boundaries)
    ymax: str = "wall"
    xmin: str = "none"          # none | outflow | inflow (open x boundaries;
    xmax: str = "none"          # requires non-periodic x)
    sigma: float = 0.25         # relaxation coefficient for incoming waves
    p_inf: float = 1.0          # far-field pressure (nondimensional units)


def _edge_deriv(P, a, axis: int, side: int):
    """One-sided compact d/daxis at the boundary row of the dense D1."""
    d1 = P["d1y"] if axis == 1 else P["d1x"]
    row = d1[0] if side == 0 else d1[-1]
    if axis == 1:
        return jnp.einsum("b,ibk->ik", row, a)
    return jnp.einsum("b,bjk->jk", row, a)


def _edge(a, axis: int, side: int):
    j = 0 if side == 0 else -1
    return a[:, j, :] if axis == 1 else a[j]


def characteristic_tendency(P, U: CompState, gamma: float, mach: float,
                            spec: NSCBCSpec, length: float, axis: int,
                            side: int):
    """Boundary-row tendencies (drho, dru, drv, drw, drE) at `side` of
    `axis` (0 = x, 1 = y). The wave decomposition uses the axis-normal
    velocity; tangential momenta advect passively (L3/L4)."""
    rho_f = U.rho
    u, v, w, T, p = primitive(P, U, gamma, mach)
    c = jnp.sqrt(jnp.maximum(T / mach ** 2, 1e-12))

    vel_n = u if axis == 0 else v                 # boundary-normal velocity
    tan1, tan2 = (v, w) if axis == 0 else (u, w)  # tangential components

    rb = _edge(rho_f, axis, side)
    unb = _edge(vel_n, axis, side)
    t1b = _edge(tan1, axis, side)
    t2b = _edge(tan2, axis, side)
    pb = _edge(p, axis, side)
    cb = _edge(c, axis, side)
    drho = _edge_deriv(P, rho_f, axis, side)
    dun = _edge_deriv(P, vel_n, axis, side)
    dt1 = _edge_deriv(P, tan1, axis, side)
    dt2 = _edge_deriv(P, tan2, axis, side)
    dp = _edge_deriv(P, p, axis, side)

    L1 = (unb - cb) * (dp - rb * cb * dun)
    L2 = unb * (cb ** 2 * drho - dp)
    L3 = unb * dt1
    L4 = unb * dt2
    L5 = (unb + cb) * (dp + rb * cb * dun)

    kinds = ((spec.xmin, spec.xmax), (spec.ymin, spec.ymax))[axis]
    kind = kinds[0] if side == 0 else kinds[1]
    if kind == "outflow":
        # non-reflecting: model the single incoming acoustic wave
        K = spec.sigma * (1.0 - (mach * jnp.abs(unb) / cb) ** 2) * cb / length
        incoming = K * (pb - spec.p_inf)
        if side == 0:                       # min side: u+c wave enters
            L5 = incoming
        else:                               # max side: u-c wave enters
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
    dn_t = -(unb * d_coeff + rb * dvel)      # normal momentum
    d1_t = -(t1b * d_coeff + rb * L3)        # tangential momenta
    d2_t = -(t2b * d_coeff + rb * L4)
    ke = 0.5 * (unb ** 2 + t1b ** 2 + t2b ** 2)
    drE_t = -(ke * d_coeff
              + dpres / ((gamma - 1.0))
              + rb * (unb * dvel + t1b * L3 + t2b * L4))
    if axis == 0:
        return drho_t, dn_t, d1_t, d2_t, drE_t   # (rho, ru, rv, rw, rE)
    return drho_t, d1_t, dn_t, d2_t, drE_t


def _set_edge(c, t, axis: int, side: int):
    j = 0 if side == 0 else -1
    if axis == 1:
        return c.at[:, j, :].set(t)
    return c.at[j].set(t)


def apply_nscbc(P, U: CompState, h: CompState, gamma: float, mach: float,
                spec: NSCBCSpec, ly: float, lx: float = 1.0) -> CompState:
    """Replace edge-row tendencies by the characteristic form for open
    sides; 'wall'/'none' sides are left to the caller's treatment."""
    comps = [h.rho, h.rhou, h.rhov, h.rhow, h.rhoE]
    for axis, kinds, length in ((1, (spec.ymin, spec.ymax), ly),
                                (0, (spec.xmin, spec.xmax), lx)):
        for side in (0, -1):
            kind = kinds[0] if side == 0 else kinds[1]
            if kind in ("wall", "none"):
                continue
            ct = characteristic_tendency(P, U, gamma, mach, spec, length,
                                         axis, side)
            comps = [_set_edge(c, t, axis, side)
                     for c, t in zip(comps, ct)]
    return CompState(*comps)
