"""Prognostic state pytree."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class State(NamedTuple):
    """Velocity components (nx, ny, nz) and scalars (ns, nx, ny, nz).

    sfc: optional (2, ns, nx, nz) interactive-surface reference values
    (jmin, jmax) -- the reference's BcsScalJmin/Jmax%ref surface state
    that SfcType=linear evolves (boundary_bcs.f90:478-545)."""

    u: jax.Array
    v: jax.Array
    w: jax.Array
    s: jax.Array
    sfc: jax.Array = None

    @property
    def shape3(self):
        return self.u.shape

    @property
    def n_scalars(self) -> int:
        return self.s.shape[0]


def zero_state(nx, ny, nz, n_scalars=1, dtype=jnp.float32) -> State:
    z = jnp.zeros((nx, ny, nz), dtype)
    return State(u=z, v=z, w=z, s=jnp.zeros((n_scalars, nx, ny, nz), dtype))
