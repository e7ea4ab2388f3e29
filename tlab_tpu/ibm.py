"""Immersed boundary method, direct-forcing v1 (reference src/ibm/*).

Geometry is a solid mask eps(x,y,z) in {0,1} built from generators
(xbars/box/hill families, reference ibm_generate_geometry*.f90). The state
is forced in solids after each RK substep (reference dns_main.f90:254-257);
the reference's cubic-spline fill of solid regions before derivatives
(ibm_spline.f90) is the round-2 refinement -- direct forcing alone is a
consistent first-order IBM.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def geometry_xbars(grid, nbars: int, height: int, width: int) -> np.ndarray:
    """Streamwise-aligned square bars on the bottom wall, spanwise-periodic
    (reference ibm_generate_geometry_xbars)."""
    nx, ny, nz = grid.shape
    eps = np.zeros((nx, ny, nz), dtype=np.float64)
    if nz == 1:
        return eps
    period = nz // max(nbars, 1)
    for b in range(nbars):
        k0 = b * period
        eps[:, :height, k0:k0 + width] = 1.0
    return eps


def geometry_box(grid, i0, i1, j0, j1, k0, k1) -> np.ndarray:
    nx, ny, nz = grid.shape
    eps = np.zeros((nx, ny, nz), dtype=np.float64)
    eps[i0:i1, j0:j1, k0:k1] = 1.0
    return eps


def geometry_hill(grid, height: float, width: float, center: float) -> np.ndarray:
    """Smooth 2-D hill on the bottom wall: y < h exp(-((x-c)/w)^2)."""
    nx, ny, nz = grid.shape
    X = grid.x.nodes[:, None, None]
    Y = grid.y.nodes[None, :, None]
    surface = height * np.exp(-(((X - center) / width) ** 2))
    return (Y < surface).astype(np.float64) * np.ones((nx, ny, nz))


def apply_ibm_state(ibm, state):
    """Zero velocity and pin scalars inside solids (direct forcing)."""
    if ibm is None:
        return state
    from tlab_tpu.dycore.state import State
    fluid = ibm["fluid"]             # 1 - eps
    s = state.s
    if s.shape[0]:
        sval = ibm.get("scalar_values")
        if sval is not None:
            s = s * fluid[None] + (1 - fluid)[None] * sval[:, None, None, None]
        else:
            s = s * fluid[None]
    return State(u=state.u * fluid, v=state.v * fluid, w=state.w * fluid,
                 s=s)


def build_ibm(eps: np.ndarray, dtype=jnp.float64, scalar_values=None) -> dict:
    d = {"eps": jnp.asarray(eps, dtype),
         "fluid": jnp.asarray(1.0 - eps, dtype)}
    if scalar_values is not None:
        d["scalar_values"] = jnp.asarray(scalar_values, dtype)
    return d
