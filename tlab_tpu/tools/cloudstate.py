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


def vapor_table(tp: thermo.ThermoParams, p: float, h: float, qt_range,
                path: str = None):
    """Sweep qt at fixed (p, h) and tabulate the equilibrium partition
    (reference smooth.x p-h case, src/tools/cloud/smooth.f90:86-95:
    vapor.dat columns qt, ql, qv, qs(T), T)."""
    qt = np.asarray(qt_range, float)
    n = qt.shape[0]
    pj = jnp.full(n, p)
    ep = jnp.zeros(n)
    T, ql = thermo.equilibrium_T_ql(tp, jnp.full(n, h), jnp.asarray(qt),
                                    pj, ep)
    qs = np.asarray(tp.qsat(jnp.asarray(T), jnp.asarray(p)))
    out = {"qt": qt, "ql": np.asarray(ql), "qv": qt - np.asarray(ql),
           "qs": qs, "T": np.asarray(T)}
    if path is not None:
        cols = np.column_stack([out[k] for k in ("qt", "ql", "qv", "qs",
                                                 "T")])
        np.savetxt(path, cols, header="qt ql qv qs T")
    return out


def buoyancy_reversal(tp: thermo.ThermoParams, h1, qt1, h2, qt2, p: float,
                      n: int = 201):
    """Buoyancy-reversal diagnostics of the mixing line (reference
    reversal.x): returns the mixing diagram plus the minimum-buoyancy
    mixture (chi_star, b_star) and the saturation crossing chi_s where
    ql -> 0 (cloud-top evaporative cooling instability criterion)."""
    d = mixing_diagram(tp, h1, qt1, h2, qt2, p, n=n)
    i_min = int(np.argmin(d["b"]))
    sat = d["ql"] > 1e-12
    # last saturated index along the line from the cloudy end (chi = 0)
    chi_s = d["chi"][np.max(np.where(sat)[0])] if sat.any() else 0.0
    d.update({"chi_star": float(d["chi"][i_min]),
              "b_star": float(d["b"][i_min]), "chi_s": float(chi_s)})
    return d
