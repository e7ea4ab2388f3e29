"""Buoyancy/body-force term (cf. reference src/physics/gravity.f90).

b(s) is an algebraic function of the scalars minus a reference background
profile; the force entering the momentum tendency is vector * b with the
Froude number folded into the vector (reference Gravity_Initialize:96-101).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BuoyancyProps:
    type: str = "none"            # none|homogeneous|linear|bilinear|quadratic|normalizedmean|subtractmean
    vector: tuple = (0.0, 0.0, 0.0)   # g_i / Froude
    parameters: tuple = (0.0,)

    @property
    def active(self):
        return tuple(abs(v) > 0.0 for v in self.vector)


def buoyancy_field(props: BuoyancyProps, s, ref):
    """b(s) - ref broadcast over y (reference Gravity_Buoyancy:232-342).

    s: (ns, nx, ny, nz); ref: (ny,) background buoyancy profile.
    """
    p = props.parameters
    refb = jnp.asarray(ref)[None, :, None]
    ns = s.shape[0]
    t = props.type
    if t == "homogeneous":
        return jnp.full(s.shape[1:], p[0], s.dtype) - refb * 0.0
    if t == "linear":
        c0 = p[ns] if len(p) > ns else 0.0
        b = c0 - refb
        for i in range(ns):
            ci = p[i] if i < len(p) else 0.0
            if ci != 0.0:
                b = b + ci * s[i]
        return b
    if t == "bilinear":
        return p[0] * s[0] + p[1] * s[1] + p[2] * s[0] * s[1] - refb
    if t == "quadratic":
        c0 = -p[0] / (p[1] / 2.0) ** 2
        return c0 * s[0] * (s[0] - p[1]) - refb
    if t == "normalizedmean":
        return p[0] * (s[0] / refb - 1.0)
    if t == "subtractmean":
        return p[0] * (s[0] - refb)
    return jnp.zeros(s.shape[1:], s.dtype)


def background_profile(props: BuoyancyProps, s_profiles, y: np.ndarray):
    """bbackground(y) from the scalar mean profiles
    (reference tlab_background.f90:217-223)."""
    if props.type == "none" or not props.active[1]:
        return np.zeros_like(y)
    sb = np.stack([prof(y) for prof in s_profiles]) if s_profiles else \
        np.zeros((0, y.shape[0]))
    b = buoyancy_field(props, jnp.asarray(sb[:, None, :, None]),
                       np.zeros_like(y))
    # jnp (not numpy) result: callers at setup time np.asarray it; the
    # jitted stats path traces through it as a folded constant
    return jnp.reshape(b[:, :, 0], (-1,))


def buoyancy_source(props: BuoyancyProps, gradient):
    """Evaporative/buoyancy source b''(s) |grad s|^2 (reference
    Gravity_Buoyancy_Source, gravity.f90:346-376): zero for the
    homogeneous/linear/bilinear types, 2 c0 |grad s|^2 for quadratic."""
    if props.type == "quadratic":
        p = props.parameters
        c0 = -p[0] / (p[1] / 2.0) ** 2
        return 2.0 * c0 * gradient
    return jnp.zeros_like(gradient)
