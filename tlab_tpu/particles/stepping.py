"""Coupled flow+particle RK stepping (reference TIME_SUBSTEP_PARTICLE,
time.f90:906-1011): particles advance with the same low-storage scheme,
interpolating the current velocity each substep."""
from __future__ import annotations

import jax.numpy as jnp

from tlab_tpu.dycore import incompressible as dyn
from tlab_tpu.dycore.state import State
from tlab_tpu.particles.core import (ParticleProps, ParticleState,
                                     particle_rhs, wrap_positions)


def rk_step_with_particles(P, grid, locate, pprops: ParticleProps,
                           state: State, pstate: ParticleState, dtime):
    kdt = P["rk"]["kdt"]
    kco = P["rk"]["kco"]
    z = jnp.zeros_like(state.u)
    hq = (z, z, z)
    hs = jnp.zeros_like(state.s)
    hpx = jnp.zeros_like(pstate.x)
    hpv = jnp.zeros_like(pstate.v)
    for i, k in enumerate(kdt):
        dte = dtime * k
        # particles first, using the pre-substep velocity (reference order)
        dpx, dpv = particle_rhs(pprops, pstate, locate,
                                state.u, state.v, state.w)
        hpx = hpx + dpx
        hpv = hpv + dpv
        new_x = wrap_positions(grid, pstate.x + dte * hpx)
        pstate = ParticleState(x=new_x, v=pstate.v + dte * hpv,
                               props=pstate.props, tags=pstate.tags)
        # flow substep
        hq, hs, _ = dyn.substep_rhs(P, state, hq, hs, dte)
        state = State(u=state.u + dte * hq[0], v=state.v + dte * hq[1],
                      w=state.w + dte * hq[2], s=state.s + dte * hs)
        if i < len(kdt) - 1:
            a = kco[i]
            hq = (a * hq[0], a * hq[1], a * hq[2])
            hs = a * hs
            hpx = a * hpx
            hpv = a * hpv
    return state, pstate
