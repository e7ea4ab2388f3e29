"""Offline pressure recovery (reference FI_PRESSURE_BOUSSINESQ,
src/physics/fi_pressure_boussinesq.f90): rebuild the momentum tendency
divergence from a snapshot and solve the Poisson equation -- used by the
statistics tools for pressure moments when p is not stored.

decomposition selects which tendency pieces feed the Poisson forcing
(the reference's DCMP_* menu, consumed by visuals.x through
[PostProcessing] PressureDecomposition, visuals.f90:136-149):
  total      advection + diffusion + all sources  (default)
  advdiff    advection + diffusion only
  advection  advection only (full Burgers minus the zero-velocity pass)
  diffusion  diffusion only
  coriolis   Coriolis tendency only
  buoyancy   buoyancy tendency only
"""
from __future__ import annotations

import jax.numpy as jnp

from tlab_tpu.dycore import incompressible as dyn
from tlab_tpu.ops import elliptic


def _burgers_sum(P, fields, u, v, w, nu):
    return (dyn._burgers_all(P, "x", 0, fields, u, nu)
            + dyn._burgers_all(P, "y", 1, fields, v, nu)
            + dyn._burgers_all(P, "z", 2, fields, w, nu))


def pressure_boussinesq(P, state, decomposition: str = "total"):
    """Diagnostic pressure from the current state."""
    u, v, w, s = state.u, state.v, state.w, state.s
    visc = P["visc"]
    dcmp = decomposition.lower()
    fields = jnp.concatenate([u[None], v[None], w[None]], axis=0)
    nu = jnp.full((3, 1, 1, 1), visc, fields.dtype)
    zero3 = jnp.zeros_like(fields)

    if dcmp in ("total", "advdiff", "advection", "resolved"):
        h = _burgers_sum(P, fields, u, v, w, nu)
    else:
        h = zero3
    if dcmp in ("advection", "diffusion"):
        # diffusion-only Burgers: zero advecting velocity
        # (fi_pressure_boussinesq.f90:116-156)
        z = jnp.zeros_like(u)
        diff = _burgers_sum(P, fields, z, z, z, nu)
        h = h - diff if dcmp == "advection" else diff
    bf = P.get("bodyforce")
    if dcmp == "coriolis":
        fn = getattr(bf, "coriolis_only", None)
        if fn is None:
            raise ValueError("PressureDecomposition=coriolis needs an "
                             "active [Rotation] term")
        r1, r2, r3 = fn(state)
        h = jnp.stack([r1 + zero3[0], r2 + zero3[1], r3 + zero3[2]])
    elif dcmp == "buoyancy":
        fn = getattr(bf, "buoyancy_only", None)
        if fn is None:
            raise ValueError("PressureDecomposition=buoyancy needs an "
                             "active [Gravity]/[BodyForce] term")
        b1, b2, b3 = fn(state)
        h = jnp.stack([b1 + zero3[0], b2 + zero3[1], b3 + zero3[2]])

    h1, h2, h3 = h[0], h[1], h[2]
    if dcmp in ("total", "resolved") and bf is not None:
        hs = jnp.zeros_like(s)
        h1, h2, h3, _ = bf(P, state, h1, h2, h3, hs)
    div = dyn.divergence(P, h1, h2, h3)
    p = elliptic.poisson(P["ell"], div,
                         bcs_b=h2[:, 0, :], bcs_t=h2[:, -1, :])
    return p
