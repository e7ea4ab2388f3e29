"""Microphysics: droplet sedimentation flux (reference
src/physics/microphysics.f90: source = d/dy (settling * f(q_l)))."""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MicrophysicsProps:
    type: str = "none"            # none | sedimentation
    settling: float = 0.0         # nondimensional settling velocity
    exponent: float = 1.0         # flux ~ settling * ql^exponent


def sedimentation_source(props: MicrophysicsProps, P, ql):
    """d/dy of the sedimentation flux, added to the total-water tendency."""
    from tlab_tpu.dycore import incompressible as dyn
    flux = props.settling * jnp.power(jnp.maximum(ql, 0.0), props.exponent)
    return dyn._d1(P, "y", 1, flux)
