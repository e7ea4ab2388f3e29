"""Thermodynamic state utilities: cloud mixing diagrams
(reference src/tools/cloud: state.x/smooth.x/saturation.x).

Evaluate the airwater equilibrium over ranges of (h, qt) at fixed pressure:
mixing lines, saturation boundaries, buoyancy reversal diagnostics.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tlab_tpu.physics import thermo


def mixing_diagram(tp: thermo.ThermoParams, h1, qt1, h2, qt2, p: float,
                   n: int = 101):
    """States along the mixing line chi in [0,1] between parcels 1 and 2.

    Returns dict of (n,) arrays: chi, h, qt, T, ql, b (buoyancy relative to
    parcel 2, the environment) -- the buoyancy-reversal diagnostic of
    cloud-top mixing (reference saturation.x/state.x role).
    """
    chi = np.linspace(0.0, 1.0, n)
    h = (1 - chi) * h1 + chi * h2
    qt = (1 - chi) * qt1 + chi * qt2
    pj = jnp.full(n, p)
    ep = jnp.zeros(n)
    T, ql = thermo.equilibrium_T_ql(tp, jnp.asarray(h), jnp.asarray(qt),
                                    pj, ep)
    R = thermo.mixture_R(tp, jnp.asarray(qt), ql)
    # density temperature relative to the environment state (chi = 1)
    Tv = jnp.asarray(T) * R / tp.Rd
    b = (Tv - Tv[-1]) / Tv[-1]
    return {"chi": chi, "h": h, "qt": qt, "T": np.asarray(T),
            "ql": np.asarray(ql), "b": np.asarray(b)}


def saturation_curve(tp: thermo.ThermoParams, T_range, p: float):
    """qsat(T) at fixed pressure."""
    T = jnp.asarray(T_range)
    return np.asarray(tp.qsat(T, jnp.asarray(p)))
