"""Buffer/sponge zones: relaxation toward reference profiles near walls
(reference src/tools/dns/boundary_buffer.f90).

tau(y) = strength * ((y - y_edge)/width)^sigma on PointsJmin/PointsJmax
strips; the tendency gains  h -= tau(y) (q - q_ref(y))  before the pressure
projection (reference BOUNDARY_BUFFER_RELAX_FLOW called at
rhs_global_incompressible_1.f90:172).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BufferSpec:
    type: str = "none"           # none | relaxation (filter/both: round 2)
    points_jmin: int = 0
    points_jmax: int = 0
    strength: float = 1.0
    sigma: float = 2.0


def tau_profile(y: np.ndarray, spec: BufferSpec) -> np.ndarray:
    """(ny,) relaxation rate, zero outside the strips."""
    ny = y.shape[0]
    tau = np.zeros(ny)
    if spec.points_jmin > 1:
        n = spec.points_jmin
        width = y[n - 1] - y[0]
        xi = (y[n - 1] - y[:n]) / width
        tau[:n] = spec.strength * xi ** spec.sigma
    if spec.points_jmax > 1:
        n = spec.points_jmax
        width = y[-1] - y[-n]
        xi = (y[-n:] - y[-n]) / width
        tau[-n:] = spec.strength * xi ** spec.sigma
    return tau


def build_buffer(y: np.ndarray, spec: BufferSpec, ref_profiles: dict,
                 dtype=jnp.float64):
    """ref_profiles: name -> (ny,) plane-averaged reference (from the ICs)."""
    if spec.type == "none" or (spec.points_jmin <= 1 and spec.points_jmax <= 1):
        return None
    tau = jnp.asarray(tau_profile(y, spec), dtype)[None, :, None]
    refs = {k: jnp.asarray(v, dtype)[None, :, None]
            for k, v in ref_profiles.items()}
    return {"tau": tau, "refs": refs}


def relax(buf, name: str, q, h):
    """h -= tau (q - ref)."""
    if buf is None:
        return h
    ref = buf["refs"].get(name)
    if ref is None:
        return h
    return h - buf["tau"] * (q - ref)
