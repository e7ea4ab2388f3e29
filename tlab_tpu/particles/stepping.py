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
    bil = pprops.bil_cloud if pprops.type.startswith("bil_cloud") else None
    if bil is not None:
        from tlab_tpu.particles import bil_cloud as bc
        # Eulerian radiation feeds the droplet equations (reference
        # rhs_part_1.f90:82-86); the closure is exposed by make_sources
        ir_field = getattr(P.get("bodyforce"), "ir_field", None)
    z = jnp.zeros_like(state.u)
    hq = (z, z, z)
    hs = jnp.zeros_like(state.s)
    hpx = jnp.zeros_like(pstate.x)
    hpv = jnp.zeros_like(pstate.v)
    hpp = jnp.zeros_like(pstate.props) if bil is not None else None
    for i, k in enumerate(kdt):
        dte = dtime * k
        # particles first, using the pre-substep velocity (reference order)
        dpx, dpv = particle_rhs(pprops, pstate, locate,
                                state.u, state.v, state.w)
        hpx = hpx + dpx
        hpv = hpv + dpv
        props = pstate.props
        if bil is not None:
            # droplet-scalar sources from the CURRENT Eulerian state
            # (reference RHS_PART_1 computes txc fields inside the substep)
            rad = ir_field(state) if ir_field is not None else None
            src = bc.eulerian_sources(P, state.s, P["visc"], bil,
                                      radiation=rad)
            loc = locate(pstate.x)
            hpp = hpp.at[:, :2].add(bc.droplet_rhs(bil, src, loc))
            props = props + dte * hpp
        new_x = wrap_positions(grid, pstate.x + dte * hpx)
        pstate = ParticleState(x=new_x, v=pstate.v + dte * hpv,
                               props=props, tags=pstate.tags)
        # flow substep
        hq, hs, _ = dyn.substep_rhs(P, state, hq, hs, dte)
        state = State(u=state.u + dte * hq[0], v=state.v + dte * hq[1],
                      w=state.w + dte * hq[2], s=state.s + dte * hs,
                      sfc=state.sfc)
        if i < len(kdt) - 1:
            a = kco[i]
            hq = (a * hq[0], a * hq[1], a * hq[2])
            hs = a * hs
            hpx = a * hpx
            hpv = a * hpv
            if bil is not None:
                hpp = a * hpp
    if bil is not None:
        # post-step bookkeeping (reference time.f90:250-258): clip negative
        # liquid; variant 4 advances the residence-time clocks
        props = pstate.props.at[:, :2].set(
            bc.liquid_clip(pstate.props[:, :2]))
        if bil.variant >= 4 and props.shape[1] >= 4:
            res = bc.residence_update(bil, dtime, pstate.x[:, 1],
                                      props[:, 2:4])
            props = props.at[:, 2:4].set(res)
        pstate = ParticleState(x=pstate.x, v=pstate.v, props=props,
                               tags=pstate.tags)
    return state, pstate
