"""Offline pressure recovery (reference FI_PRESSURE_BOUSSINESQ,
src/physics/fi_pressure_boussinesq.f90): rebuild the momentum tendency
divergence from a snapshot and solve the Poisson equation -- used by the
statistics tools for pressure moments when p is not stored.
"""
from __future__ import annotations

import jax.numpy as jnp

from tlab_tpu.dycore import incompressible as dyn
from tlab_tpu.ops import elliptic


def pressure_boussinesq(P, state):
    """Diagnostic pressure from the current state (advection + sources)."""
    u, v, w, s = state.u, state.v, state.w, state.s
    visc = P["visc"]
    fields = jnp.concatenate([u[None], v[None], w[None]], axis=0)
    nu = jnp.full((3, 1, 1, 1), visc, fields.dtype)
    adv = (dyn._burgers_all(P, "x", 0, fields, u, nu)
           + dyn._burgers_all(P, "y", 1, fields, v, nu)
           + dyn._burgers_all(P, "z", 2, fields, w, nu))
    h1, h2, h3 = adv[0], adv[1], adv[2]
    if P["bodyforce"] is not None:
        hs = jnp.zeros_like(s)
        h1, h2, h3, _ = P["bodyforce"](P, state, h1, h2, h3, hs)
    div = dyn.divergence(P, h1, h2, h3)
    p = elliptic.poisson(P["ell"], div,
                         bcs_b=h2[:, 0, :], bcs_t=h2[:, -1, :])
    return p
