"""Large-scale and special forcing terms (reference
src/physics/largescaleforcing.f90, specialforcing.f90).

- Subsidence (ConstantDivergenceLocal): w_LS(y) = D*y; the scalar/momentum
  source is w_LS * d a/dy (reference LargeScaleForcing_Subsidence:79-120).
- Sinusoidal wavemaker (special forcing): time-harmonic body force localized
  by a Gaussian envelope, for internal-wave generation studies.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SubsidenceProps:
    type: str = "none"        # none | constantdivergencelocal
    divergence: float = 0.0   # D (1/time)


def subsidence_source(props: SubsidenceProps, P, y, a):
    """w_LS * da/dy with w_LS = D*y, added to a's tendency."""
    from tlab_tpu.dycore import incompressible as dyn
    w_ls = (props.divergence * jnp.asarray(y))[None, :, None]
    return w_ls * dyn._d1(P, "y", 1, a)


@dataclasses.dataclass(frozen=True)
class WavemakerProps:
    type: str = "none"        # none | sinusoidal
    amplitude: float = 0.0
    omega: float = 1.0        # forcing frequency
    x0: float = 0.0
    y0: float = 0.0
    radius: float = 0.1
    component: int = 1        # which momentum gets the force (0=u,1=v)


def wavemaker_force(props: WavemakerProps, X, Y, t):
    """Gaussian-localized harmonic forcing field."""
    env = jnp.exp(-((X - props.x0) ** 2 + (Y - props.y0) ** 2)
                  / (2.0 * props.radius ** 2))
    return props.amplitude * env * jnp.sin(props.omega * t)
