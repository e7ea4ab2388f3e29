"""Chemistry-like scalar sources (reference src/physics/chemistry.f90):
quadratic reaction and layered relaxation."""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ChemistryProps:
    type: str = "none"            # none | quadratic | layeredrelaxation
    damkohler: float = 1.0
    parameters: tuple = (1.0,)
    scalar: int = 0


def source(props: ChemistryProps, s_i, y=None):
    if props.type == "quadratic":
        # Da * p1 * s (1 - s): logistic-type reaction
        return props.damkohler * props.parameters[0] * s_i * (1.0 - s_i)
    if props.type == "layeredrelaxation":
        # relax toward 0 within a surface layer of thickness p2 at rate Da/p1
        thick = props.parameters[1] if len(props.parameters) > 1 else 1.0
        strength = props.damkohler / max(props.parameters[0], 1e-30)
        prof = jnp.exp(-jnp.asarray(y)[None, :, None] / thick)
        return -strength * prof * s_i
    return jnp.zeros_like(s_i)
