"""Anelastic moist thermodynamics (reference src/thermodynamics/*).

Mixtures: dry air ('air'), unsaturated moist air ('airvapor'), moist air
with liquid via saturation adjustment ('airwater') -- the reference's
MIXT_TYPE_* families (thermodynamics.f90:34-48, thermo_anelastic.f90,
thermo_airwater.f90).

Nondimensional convention (documented here; structurally equivalent to the
reference's cp-based scaling):
  - temperature scaled by T_ref, pressure by p_ref, heights by L_ref
  - specific heats scaled by Cp_dry  => Cd = 1
  - gas constants scaled by Cp_dry   => Rd = (gamma-1)/gamma
  - latent heat scaled by Cp_dry*T_ref
State scalars in anelastic mode: s1 = h (moist static energy, cp T + g y
- Lv0 ql per unit Cp T_ref), s2 = q_t (total water), diagnostic q_l.

  T = (h - ep(y) + ql Lv0) / (Cd + qt Cdv + ql Cvl)
  b = (rho_bar - p_bar/(R_mix T)) / rho_bar        (EQNS_BOD_EXPLICIT)

Saturation adjustment solves ql >= 0 with qv <= qsat(T, p) by masked Newton
iterations (jit-friendly fixed iteration count), the equivalent of
THERMO_AIRWATER_PH (thermo_airwater.f90:25-33).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ThermoParams:
    mixture: str = "airwater"      # air | airvapor | airwater
    gamma: float = 1.4
    rd_ov_rv: float = 0.6220       # Rd/Rv (molar-mass ratio water/air)
    T_ref: float = 298.0           # K
    p_ref: float = 1.0e5           # Pa
    L_ref: float = 100.0           # m, height scale
    scale_height_inv: float = 0.0  # g L_ref / (Cp_d T_ref); 0 => Boussinesq-like
    # dimensional property table (standard literature values)
    Cpd_dim: float = 1007.0        # J/kg/K
    Cpv_dim: float = 1870.0
    Cl_dim: float = 4218.0
    Lv0_dim: float = 2.501e6       # J/kg at triple point
    Rd_dim: float = 287.04

    # -- nondimensional constants ------------------------------------------
    @property
    def Cd(self):
        return 1.0

    @property
    def Cdv(self):
        return self.Cpv_dim / self.Cpd_dim - 1.0

    @property
    def Cvl(self):
        return (self.Cl_dim - self.Cpv_dim) / self.Cpd_dim

    @property
    def Cl(self):
        return self.Cl_dim / self.Cpd_dim

    @property
    def Rd(self):
        return self.Rd_dim / self.Cpd_dim

    @property
    def Rv(self):
        return self.Rd / self.rd_ov_rv

    @property
    def Rdv(self):
        return self.Rv - self.Rd

    @property
    def Lv0(self):
        # latent heat at T = 0 (linear Kirchhoff extrapolation), scaled
        L0 = self.Lv0_dim + (self.Cl_dim - self.Cpv_dim) * 273.15
        return L0 / (self.Cpd_dim * self.T_ref)

    def psat(self, T):
        """Saturation pressure, nondimensional (T in T_ref units, p in p_ref).

        Bolton (1980) fit: es = 611.2 exp(17.67 Tc/(Tc+243.5)) Pa. The
        reference uses the Flatau et al. (1992) polynomial; both are within
        0.1% over atmospheric temperatures.
        """
        Tc = T * self.T_ref - 273.15
        es = 611.2 * jnp.exp(17.67 * Tc / (Tc + 243.5))
        return es / self.p_ref

    def qsat(self, T, p):
        """Saturation specific humidity over total moist air."""
        ps = self.psat(T)
        r = self.rd_ov_rv * ps / jnp.maximum(p - ps, 1e-10)
        return r / (1.0 + r)


# ---------------------------------------------------------------------------
# Equilibrium (saturation adjustment)
# ---------------------------------------------------------------------------

def temperature_unsaturated(tp: ThermoParams, h, qt, ep):
    return (h - ep) / (tp.Cd + qt * tp.Cdv)


def equilibrium_T_ql(tp: ThermoParams, h, qt, p, ep, n_newton: int = 8):
    """(T, ql) from (h, qt) at pressure p: airwater saturation adjustment.

    Masked Newton on T for saturated points; unsaturated points keep ql = 0.
    """
    if tp.mixture in ("air", "airvapor"):
        T = temperature_unsaturated(tp, h, qt * (tp.mixture == "airvapor"), ep)
        return T, jnp.zeros_like(T)

    T0 = temperature_unsaturated(tp, h, qt, ep)
    saturated = qt > tp.qsat(T0, p)

    def F_and_dF(T):
        qs = tp.qsat(T, p)
        ql = jnp.clip(qt - qs, 0.0, qt)
        cp = tp.Cd + qt * tp.Cdv + ql * tp.Cvl
        F = cp * T - ql * tp.Lv0 - (h - ep)
        # d qsat/dT = qsat (1 - qsat) p/(p - ps) dln ps/dT (from r = eps ps/(p-ps)),
        # with dln ps/dT from the Bolton fit
        Tc = T * tp.T_ref - 273.15
        dlnps = 17.67 * 243.5 / (Tc + 243.5) ** 2 * tp.T_ref
        ps = tp.psat(T)
        dqs = qs * (1.0 - qs) * p / jnp.maximum(p - ps, 1e-10) * dlnps
        dF = cp + (tp.Cvl * T - tp.Lv0) * (-dqs)
        return F, dF

    T = T0
    for _ in range(n_newton):
        F, dF = F_and_dF(T)
        T = jnp.where(saturated, T - F / dF, T)
    qs = tp.qsat(T, p)
    ql = jnp.where(saturated, jnp.clip(qt - qs, 0.0, qt), 0.0)
    return T, ql


# ---------------------------------------------------------------------------
# Anelastic background + buoyancy
# ---------------------------------------------------------------------------

def mixture_R(tp: ThermoParams, qt, ql):
    return tp.Rd + qt * tp.Rdv - ql * tp.Rv


def hydrostatic_background(tp: ThermoParams, y: np.ndarray,
                           h_prof: np.ndarray, qt_prof: np.ndarray,
                           p_bottom: float = 1.0):
    """Integrate d ln p/dy = -g_nd / (R_mix T) upward from the bottom wall
    (reference Gravity_Hydrostatic_Enthalpy, gravity.f90:121+).

    Returns dict of (ny,) profiles: p, T, rho, ql, ep.
    """
    g_nd = tp.scale_height_inv
    ny = y.shape[0]
    ep = g_nd * (y - y[0])         # potential-energy profile in h units
    p = np.zeros(ny)
    T = np.zeros(ny)
    ql = np.zeros(ny)
    p[0] = p_bottom

    def TRj(j, pj):
        Tj, qlj = equilibrium_T_ql(
            tp, jnp.asarray(h_prof[j]), jnp.asarray(qt_prof[j]),
            jnp.asarray(pj), jnp.asarray(ep[j]))
        Rj = mixture_R(tp, qt_prof[j], float(qlj))
        return float(Tj), float(qlj), float(Rj)

    T[0], ql[0], R0 = TRj(0, p[0])
    for j in range(ny - 1):
        dy = y[j + 1] - y[j]
        # RK2 (midpoint) integration of d ln p / dy
        Tj, qlj, Rj = TRj(j, p[j])
        k1 = -g_nd / (Rj * Tj)
        p_mid = p[j] * np.exp(k1 * 0.5 * dy)
        Tm, qlm, Rm = TRj(j, p_mid)      # profiles vary per node; midpoint in p
        k2 = -g_nd / (Rm * Tm)
        p[j + 1] = p[j] * np.exp(k2 * dy)
        T[j + 1], ql[j + 1], _ = TRj(j + 1, p[j + 1])
    R = mixture_R(tp, qt_prof, ql)
    rho = p / (R * T)
    return {"p": p, "T": T, "rho": rho, "ql": ql, "ep": ep,
            "rho_inv": 1.0 / rho}


def buoyancy_explicit(tp: ThermoParams, s, bg: dict):
    """b = (rho_bar - p_bar/(R_mix T))/rho_bar from state scalars
    (reference Thermo_Anelastic_BUOYANCY, thermo_anelastic.f90:312-374)."""
    h = s[0]
    qt = s[1] if s.shape[0] > 1 else jnp.zeros_like(h)
    ep = jnp.asarray(bg["ep"])[None, :, None]
    p = jnp.asarray(bg["p"])[None, :, None]
    rho = jnp.asarray(bg["rho"])[None, :, None]
    T, ql = equilibrium_T_ql(tp, h, qt, p, ep)
    R = mixture_R(tp, qt, ql)
    return (rho - p / (R * T)) / rho


def diagnostic_fields(tp: ThermoParams, s, bg: dict):
    """T, ql, relative buoyancy for statistics/visuals."""
    h = s[0]
    qt = s[1] if s.shape[0] > 1 else jnp.zeros_like(h)
    ep = jnp.asarray(bg["ep"])[None, :, None]
    p = jnp.asarray(bg["p"])[None, :, None]
    T, ql = equilibrium_T_ql(tp, h, qt, p, ep)
    return {"T": T, "ql": ql, "b": buoyancy_explicit(tp, s, bg)}
