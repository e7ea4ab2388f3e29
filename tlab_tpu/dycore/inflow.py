"""Unsteady inflow for the spatial mode (reference src/tools/dns/
boundary_inflow.f90): a stored temporal-simulation box is swept past the
inflow plane with Taylor's hypothesis, providing the time-dependent target
profiles for the Imin buffer strip.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass
class InflowBox:
    """fields: name -> (nx_i, ny) planes of the stored box (z-averaged or
    2-D); u_convect: sweep speed; lx: box streamwise extent."""

    fields: dict
    u_convect: float
    lx: float

    def refs_at(self, t: float, dtype=jnp.float64) -> dict:
        """Interpolated inflow plane at time t (periodic sweep)."""
        out = {}
        for name, box in self.fields.items():
            nx_i = box.shape[0]
            xi = (self.u_convect * t / self.lx * nx_i) % nx_i
            i0 = int(np.floor(xi)) % nx_i
            i1 = (i0 + 1) % nx_i
            w = xi - np.floor(xi)
            plane = (1.0 - w) * box[i0] + w * box[i1]
            out[name] = jnp.asarray(plane, dtype)[None, :, None]
        return out


def from_temporal_snapshot(state, u_convect: float, lx: float) -> InflowBox:
    """Build an inflow box from a temporal-simulation state (z-mean)."""
    fields = {"u": np.asarray(state.u).mean(axis=2),
              "v": np.asarray(state.v).mean(axis=2),
              "w": np.asarray(state.w).mean(axis=2)}
    for i in range(state.s.shape[0]):
        fields[f"s{i}"] = np.asarray(state.s[i]).mean(axis=2)
    return InflowBox(fields=fields, u_convect=u_convect, lx=lx)
