"""Derived-field diagnostics (reference src/mappings/fi_*.f90).

3D -> 3D fields built from first derivatives of the state: vorticity,
enstrophy, strain, velocity-gradient invariants (P, Q, R), scalar gradient,
viscous dissipation. Each is a handful of dense-matrix derivative matmuls +
elementwise algebra, fully fused under jit.
"""
from __future__ import annotations

import jax.numpy as jnp

from tlab_tpu.dycore import incompressible as dyn


def _grad(P, a):
    return (dyn._d1(P, "x", 0, a), dyn._d1(P, "y", 1, a),
            dyn._d1(P, "z", 2, a))


def velocity_gradient(P, u, v, w):
    """3x3 tensor A_ij = du_i/dx_j as a dict of fields."""
    gu = _grad(P, u)
    gv = _grad(P, v)
    gw = _grad(P, w)
    return {"ux": gu[0], "uy": gu[1], "uz": gu[2],
            "vx": gv[0], "vy": gv[1], "vz": gv[2],
            "wx": gw[0], "wy": gw[1], "wz": gw[2]}


def curl(P, u, v, w):
    """Vorticity (reference FI_CURL, fi_vectorcalculus.f90:20)."""
    return (dyn._d1(P, "y", 1, w) - dyn._d1(P, "z", 2, v),
            dyn._d1(P, "z", 2, u) - dyn._d1(P, "x", 0, w),
            dyn._d1(P, "x", 0, v) - dyn._d1(P, "y", 1, u))


def vorticity_magnitude2(P, u, v, w):
    """Enstrophy density w_i w_i (reference FI_VORTICITY)."""
    ox, oy, oz = curl(P, u, v, w)
    return ox * ox + oy * oy + oz * oz


def strain2(P, u, v, w):
    """s_ij s_ij (reference FI_STRAIN, fi_strain.f90:68-99):
    u,x^2 + v,y^2 + w,z^2 + 1/2[(u,y+v,x)^2 + (u,z+w,x)^2 + (v,z+w,y)^2]."""
    g = velocity_gradient(P, u, v, w)
    diag = g["ux"] ** 2 + g["vy"] ** 2 + g["wz"] ** 2
    off = 0.5 * ((g["uy"] + g["vx"]) ** 2
                 + (g["uz"] + g["wx"]) ** 2
                 + (g["vz"] + g["wy"]) ** 2)
    return diag + off


def invariants(P, u, v, w):
    """Invariants of the velocity-gradient tensor (reference
    FI_INVARIANT_{P,Q,R}, fi_vectorcalculus.f90:111-229):
    P = -tr(A), Q = (P^2 - tr(A^2))/2, R = -det(A)."""
    g = velocity_gradient(P, u, v, w)
    A = jnp.stack([jnp.stack([g["ux"], g["uy"], g["uz"]]),
                   jnp.stack([g["vx"], g["vy"], g["vz"]]),
                   jnp.stack([g["wx"], g["wy"], g["wz"]])])
    trA = A[0, 0] + A[1, 1] + A[2, 2]
    trA2 = sum(A[i, j] * A[j, i] for i in range(3) for j in range(3))
    detA = (A[0, 0] * (A[1, 1] * A[2, 2] - A[1, 2] * A[2, 1])
            - A[0, 1] * (A[1, 0] * A[2, 2] - A[1, 2] * A[2, 0])
            + A[0, 2] * (A[1, 0] * A[2, 1] - A[1, 1] * A[2, 0]))
    inv_p = -trA
    inv_q = 0.5 * (inv_p ** 2 - trA2)
    inv_r = -detA
    return inv_p, inv_q, inv_r


def gradient_magnitude2(P, s):
    """|grad s|^2 (reference FI_GRADIENT)."""
    gx, gy, gz = _grad(P, s)
    return gx * gx + gy * gy + gz * gz


def dissipation(P, u, v, w, visc):
    """Viscous dissipation rate 2 nu s_ij s_ij incompressible
    (reference FI_DISSIPATION)."""
    return 2.0 * visc * strain2(P, u, v, w)


def gate_intermittency(field, threshold):
    """Binary gate field (reference FI_GATE, fi_gate.f90)."""
    return (field > threshold).astype(field.dtype)
