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
import functools

import numpy as np
import jax.numpy as jnp

# Reference property data (Iribarne & Godson 1981, thermodynamics.f90:
# 270-283, 420-422): molar masses in kg/kmol, heat capacities in J/kg/K,
# latent heat of vaporization at 273.15 K in J/kg
RGAS = 8314.0
WGHT_V = 18.015                    # water vapor
WGHT_D = 28.9644                   # dry air
LV_273 = 2501600.0

# Flatau et al. (1992) saturation-pressure polynomial, powers of
# (T - 273.15), Pa (thermodynamics.f90:459-470)
FLATAU = (0.611213476e+3, 0.444007856e+2, 0.143064234e+1,
          0.264461437e-1, 0.305930558e-3, 0.196237241e-5,
          0.892344772e-8, -0.373208410e-10, 0.209339997e-13)


@functools.lru_cache(maxsize=8)
def psat_coeffs(T_ref: float = 298.0, p_ref: float = 1.0e5):
    """Nondimensional THERMO_PSAT(9): the Flatau fit re-expanded from
    powers of (T-273.15) to powers of T (thermodynamics.f90:473-489),
    then scaled by p_ref with T in T_ref units (:539-542).
    p_sat(T) = sum_i a_i T^{i-1}."""
    n = len(FLATAU)
    t0 = 273.15
    a = np.zeros(n)
    for ipsat in range(1, n + 1):
        for i in range(ipsat, n + 1):
            tmp1 = 1.0
            for j in range(i - 1, i - ipsat, -1):
                tmp1 *= float(j)
            a[ipsat - 1] += FLATAU[i - 1] * t0 ** (i - 1) * tmp1 \
                * (-1.0) ** (i - ipsat)
        tmp2 = 1.0
        for j in range(ipsat - 1, 0, -1):
            tmp2 *= float(j)
        a[ipsat - 1] /= tmp2 * t0 ** (ipsat - 1)
    # nondimensionalization: p by p_ref, T by T_ref
    a /= p_ref
    for ipsat in range(n):
        a[ipsat] *= T_ref ** ipsat
    return tuple(a)


def psat_polynomial(coeffs, T):
    """Horner evaluation of p_sat(T) (reference Thermo_Psat_Polynomial)."""
    p = jnp.zeros_like(T) + coeffs[-1]
    for c in coeffs[-2::-1]:
        p = p * T + c
    return p


def dpsat_polynomial(coeffs, T):
    """dp_sat/dT (reference Thermo_dPsat_Polynomial)."""
    n = len(coeffs)
    d = jnp.zeros_like(T) + coeffs[-1] * (n - 1)
    for i in range(n - 2, 0, -1):
        d = d * T + coeffs[i] * i
    return d


@dataclasses.dataclass(frozen=True)
class ThermoParams:
    mixture: str = "airwater"      # air | airvapor | airwater | airwaterlinear
    gamma: float = 1.4
    rd_ov_rv: float = WGHT_V / WGHT_D   # Rd/Rv (molar-mass ratio water/air)
    T_ref: float = 298.0           # K
    p_ref: float = 1.0e5           # Pa
    L_ref: float = 100.0           # m, height scale
    scale_height_inv: float = 0.0  # g L_ref / (Cp_d T_ref); 0 => Boussinesq-like
    # dimensional property table (reference values, thermodynamics.f90)
    Cpd_dim: float = 1007.0        # J/kg/K
    Cpv_dim: float = 1870.0
    Cl_dim: float = 4217.6
    Lv0_dim: float = LV_273        # J/kg at 273.15 K
    Rd_dim: float = RGAS / WGHT_D
    psat_mode: str = "polynomial"  # polynomial (reference Flatau) | bolton
    dsmooth: float = 0.0           # saturation-adjustment smoothing factor
    cratio_inv: float = 1.0        # (gama0-1) M^2 (compressible); 1 else
    # Compressible nondimensionalization (thermodynamics.f90:543-549):
    # pressure scaled by the dynamic rho0 U0^2 instead of p0, so the gas
    # constants and the psat table are multiplied by
    # RRATIO = p0/(rho0 U0^2) = 1/(gama0 M^2). 0.0 = anelastic/dimensional
    # convention (fields R in cp units, psat in p_ref units).
    rratio: float = 0.0
    thermo_param: tuple = ()       # [Thermodynamics] Parameters (linear mix)
    # [Thermodynamics] Nondimensional: when False the reference keeps the
    # property tables in SI units (thermodynamics.f90:518-556 skipped,
    # GRATIO = 1): T in K, p in Pa, h in J/kg, psat dimensional, and
    # ScaleHeight = 1/g so scale_height_inv = g
    nondimensional: bool = True

    # -- constants (cp-scaled nondimensional, or SI when Nondimensional=no)
    @property
    def _cp_norm(self):
        return self.Cpd_dim if self.nondimensional else 1.0

    @property
    def Cd(self):
        return self.Cpd_dim / self._cp_norm

    @property
    def Cdv(self):
        return (self.Cpv_dim - self.Cpd_dim) / self._cp_norm

    @property
    def Cvl(self):
        return (self.Cl_dim - self.Cpv_dim) / self._cp_norm

    @property
    def Cl(self):
        return self.Cl_dim / self._cp_norm

    @property
    def Rd(self):
        if self.rratio:
            # compressible units: Rd/Rref = 1, scaled by RRATIO
            # (thermodynamics.f90:548 THERMO_R *= RRATIO)
            return self.rratio
        return self.Rd_dim / self._cp_norm

    @property
    def gratio(self):
        """GRATIO (thermodynamics.f90:517,554): R0/Cp0 in the
        nondimensional anelastic formulation, 1 in the dimensional one."""
        return self.Rd_dim / self.Cpd_dim if self.nondimensional else 1.0

    @property
    def R_norm(self):
        """Gas-constant normalization: reference THERMO_R is divided by
        RREF = Rd only in the nondimensional formulation
        (thermodynamics.f90:519)."""
        return self.Rd if self.nondimensional else 1.0

    @property
    def Rv(self):
        return self.Rd / self.rd_ov_rv

    @property
    def Rdv(self):
        return self.Rv - self.Rd

    @property
    def Cdl(self):
        return (self.Cl_dim - self.Cpd_dim) / self._cp_norm

    @property
    def Lv0(self):
        # latent heat at T = 0 (linear Kirchhoff extrapolation), scaled;
        # equals the reference's -THERMO_AI(6,1,3) (thermodynamics.f90:580)
        L0 = self.Lv0_dim + (self.Cl_dim - self.Cpv_dim) * 273.15
        if not self.nondimensional:
            return L0
        return L0 / (self.Cpd_dim * self.T_ref)

    @property
    def psat_cf(self):
        """THERMO_PSAT in the active units (dimensional Pa/K when
        Nondimensional=no, thermodynamics.f90:537-542 skipped)."""
        if not self.nondimensional:
            return psat_coeffs(1.0, 1.0)
        cf = psat_coeffs(self.T_ref, self.p_ref)
        if self.rratio:
            # compressible: psat in rho0 U0^2 units
            # (thermodynamics.f90:547 THERMO_PSAT *= RRATIO)
            cf = tuple(c * self.rratio for c in cf)
        return cf

    # formation-enthalpy differences (airwater family: Lv = Ld = Ldv = 0,
    # Lvl = Ldl = -Lv0, thermodynamics.f90:580-585)
    @property
    def Lv(self):
        return 0.0

    @property
    def Ld(self):
        return 0.0

    @property
    def Ldv(self):
        return 0.0

    @property
    def Lvl(self):
        return -self.Lv0

    @property
    def Ldl(self):
        return -self.Lv0

    def psat(self, T):
        """Saturation pressure, nondimensional (T in T_ref units, p in
        p_ref). Default: the reference's Flatau et al. (1992) polynomial
        (thermodynamics.f90:459-489); 'bolton' keeps the round-1
        exponential fit (within 0.1% over atmospheric temperatures)."""
        if self.psat_mode == "polynomial":
            return psat_polynomial(self.psat_cf, T)
        Tc = T * self.T_ref - 273.15
        es = 611.2 * jnp.exp(17.67 * Tc / (Tc + 243.5))
        return es / self.p_ref

    def dpsat(self, T):
        """dp_sat/dT, consistent with psat()."""
        if self.psat_mode == "polynomial":
            return dpsat_polynomial(self.psat_cf, T)
        Tc = T * self.T_ref - 273.15
        return self.psat(T) * 17.67 * 243.5 / (Tc + 243.5) ** 2 * self.T_ref

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


def equilibrium_newton_error(tp: ThermoParams, s, bg: dict):
    """The reference's NEWTONRAPHSON_ERROR for the dns.out NewtonRs
    column (thermo_anelastic.f90:176, dns_main.f90:483-493): the final
    Newton step ratio |F/F'|/T of the saturation adjustment, maxed over
    the SATURATED points (unsaturated points never enter the Newton)."""
    h = s[0]
    qt = s[1] if s.shape[0] > 1 else jnp.zeros_like(h)
    ep = jnp.asarray(bg["ep"])[None, :, None]
    p = jnp.asarray(bg["p"])[None, :, None]
    _, _, err = equilibrium_T_ql(tp, h, qt, p, ep, with_err=True)
    return err


def equilibrium_T_ql(tp: ThermoParams, h, qt, p, ep, n_newton: int = 8,
                     with_err: bool = False):
    """(T, ql) from (h, qt) at pressure p: airwater saturation adjustment,
    the reference's Thermo_Anelastic_PH (thermo_anelastic.f90:75-200)
    vectorized as a masked Newton with the exact polynomial formulation:
    multiplying h = cp(qt,ql(T)) T - ql(T) Lv0 through by (p - psat(T))
    gives a polynomial in T whose coefficients combine THERMO_PSAT with
    (alpha, beta); the equilibrium vapor uses the exact per-total-mass
    convention q_v = eps psat/(p - psat) (1 - qt).
    """
    if tp.mixture in ("air", "airvapor"):
        T = temperature_unsaturated(tp, h, qt * (tp.mixture == "airvapor"), ep)
        if with_err:
            return T, jnp.zeros_like(T), jnp.zeros((), T.dtype)
        return T, jnp.zeros_like(T)

    H = h - ep
    T0 = H / (tp.Cd + qt * tp.Cdv)
    eps = tp.rd_ov_rv
    ps0 = tp.psat(T0)
    r0 = eps / (p / ps0 - 1.0)
    qsat0 = r0 / (1.0 + r0)
    saturated = qsat0 < qt

    if tp.psat_mode == "polynomial":
        # reference B_LOC polynomial (thermo_anelastic.f90:156-177)
        cf = tp.psat_cf
        alpha = (eps * tp.Lv0 + qt * tp.Lv0 * (1.0 - eps) + H) / p
        beta = (eps * tp.Cvl + tp.Cd + qt * (tp.Cdl - eps * tp.Cvl)) / p
        b = [None] * 10
        b[0] = H + qt * tp.Lv0 - cf[0] * alpha
        for i in range(1, 9):
            b[i] = cf[i - 1] * beta - cf[i] * alpha
        b[1] = b[1] - tp.Cd - qt * tp.Cdl
        b[9] = cf[8] * beta
        b = [jnp.broadcast_to(jnp.asarray(c, T0.dtype)
                              if not hasattr(c, "shape") else c,
                              T0.shape) for c in b]
        T_sat, nerr = _newton_psat_poly(b, T0, nr=max(n_newton, 5))
        ps = tp.psat(T_sat)
        ql_sat = qt - eps / (p / ps - 1.0) * (1.0 - qt)
        T = jnp.where(saturated, T_sat, T0)
        ql = jnp.where(saturated, jnp.clip(ql_sat, 0.0, qt), 0.0)
        if with_err:
            return T, ql, jnp.max(jnp.where(saturated, nerr, 0.0))
        return T, ql

    # legacy exponential-fit path: generic masked Newton
    def F_and_dF(T):
        qs = tp.qsat(T, p)
        ql = jnp.clip(qt - qs, 0.0, qt)
        cp = tp.Cd + qt * tp.Cdv + ql * tp.Cvl
        F = cp * T - ql * tp.Lv0 - H
        ps = tp.psat(T)
        dlnps = tp.dpsat(T) / jnp.maximum(ps, 1e-30)
        dqs = qs * (1.0 - qs) * p / jnp.maximum(p - ps, 1e-10) * dlnps
        dF = cp + (tp.Cvl * T - tp.Lv0) * (-dqs)
        return F, dF

    T = T0
    step = jnp.zeros_like(T)
    for _ in range(n_newton):
        F, dF = F_and_dF(T)
        step = F / dF
        T = jnp.where(saturated, T - step, T)
    qs = tp.qsat(T, p)
    ql = jnp.where(saturated, jnp.clip(qt - qs, 0.0, qt), 0.0)
    if with_err:
        err = jnp.max(jnp.where(saturated, jnp.abs(step) / jnp.abs(T), 0.0))
        return T, ql, err
    return T, ql


# ---------------------------------------------------------------------------
# Anelastic background + buoyancy
# ---------------------------------------------------------------------------

def mixture_R(tp: ThermoParams, qt, ql):
    return tp.Rd + qt * tp.Rdv - ql * tp.Rv


def hydrostatic_background(tp: ThermoParams, y: np.ndarray,
                           h_prof: np.ndarray, qt_prof: np.ndarray,
                           p_ref: float = 1.0, y_ref: float = None,
                           d1y: np.ndarray = None, niter: int = 10):
    """Hydrostatic anelastic background, the reference
    Gravity_Hydrostatic_Enthalpy (gravity.f90:121-227):

    - ep = (y - yref) * GRATIO * scaleheightinv. GRATIO = R0/Cp0
      (thermodynamics.f90:554) converts the R-based scale height
      ([Thermodynamics] ScaleHeight = Rd T0/(g L)) to the cp-normalized
      enthalpy units of the scalar; in our Cd=1 convention GRATIO = tp.Rd.
    - fixed-point iteration (niter=10): T from equilibrium at the current
      p, then integrate d ln p/dy = -scaleheightinv/(R_hat T) with
      R_hat = R_mix/Rd (reference-normalized gas constant, =1 for dry
      air) by the compact cumulative integral (FDM_Int1_Solve BCS_MIN;
      d1y: dense D1 matrix; trapezoid fallback), then normalize so
      p(yref) = pref by linear interpolation (gravity.f90:187-195).
    - rho = p/(R_hat T), the reference Thermo_Anelastic_DENSITY
      normalization (rho0 = p0/(Rd T0)).

    Returns dict of (ny,) profiles: p, T, rho, ql, ep.
    """
    g_nd = tp.scale_height_inv
    ny = y.shape[0]
    if y_ref is None:
        y_ref = float(y[0])
    ep = tp.gratio * g_nd * (y - y_ref)

    if d1y is not None:
        D = np.array(d1y, dtype=np.float64)
        D[0, :] = 0.0
        D[0, 0] = 1.0

        def cumint(f):
            rhs = np.array(f, dtype=np.float64)
            rhs[0] = 0.0
            return np.linalg.solve(D, rhs)
    else:
        dy_ = np.diff(y)

        def cumint(f):
            out = np.zeros_like(f)
            out[1:] = np.cumsum(0.5 * (f[1:] + f[:-1]) * dy_)
            return out

    h64 = np.asarray(h_prof, np.float64)
    qt64 = np.asarray(qt_prof, np.float64)
    p = np.full(ny, p_ref, dtype=np.float64)
    T = np.zeros(ny)
    ql = np.zeros(ny)
    for _ in range(max(niter, 1)):
        Tj, qlj = equilibrium_T_ql(tp, jnp.asarray(h64), jnp.asarray(qt64),
                                   jnp.asarray(p), jnp.asarray(ep))
        T = np.asarray(Tj, np.float64)
        ql = np.asarray(qlj, np.float64)
        R_hat = mixture_R(tp, qt64, ql) / tp.R_norm
        lnp = cumint(-g_nd / (R_hat * T))
        p = np.exp(lnp)
        p *= p_ref / np.interp(y_ref, y, p)
    R_hat = mixture_R(tp, qt64, ql) / tp.R_norm
    rho = p / (R_hat * T)
    return {"p": p, "T": T, "rho": rho, "ql": ql, "ep": ep,
            "rho_inv": 1.0 / rho}


def buoyancy_explicit(tp: ThermoParams, s, bg: dict):
    """b = (rho_bar - p_bar/(R_hat T))/rho_bar from state scalars, with
    R_hat = R_mix/Rd the reference-normalized gas constant (reference
    Thermo_Anelastic_BUOYANCY, thermo_anelastic.f90:312-374)."""
    h = s[0]
    qt = s[1] if s.shape[0] > 1 else jnp.zeros_like(h)
    ep = jnp.asarray(bg["ep"])[None, :, None]
    p = jnp.asarray(bg["p"])[None, :, None]
    rho = jnp.asarray(bg["rho"])[None, :, None]
    T, ql = equilibrium_T_ql(tp, h, qt, p, ep)
    R_hat = mixture_R(tp, qt, ql) / tp.R_norm
    return (rho - p / (R_hat * T)) / rho


def diagnostic_fields(tp: ThermoParams, s, bg: dict):
    """T, ql, relative buoyancy for statistics/visuals."""
    h = s[0]
    qt = s[1] if s.shape[0] > 1 else jnp.zeros_like(h)
    ep = jnp.asarray(bg["ep"])[None, :, None]
    p = jnp.asarray(bg["p"])[None, :, None]
    T, ql = equilibrium_T_ql(tp, h, qt, p, ep)
    return {"T": T, "ql": ql, "b": buoyancy_explicit(tp, s, bg)}


# ---------------------------------------------------------------------------
# Airwater equilibrium variants (reference thermo_airwater.f90:25-33).
# All vectorized over arbitrary array shapes; Newton loops are fixed-count
# (nrmax=3 as the reference) for jit friendliness. State convention:
# qt total water, ql liquid; gas constants/latent heats from ThermoParams.
# ---------------------------------------------------------------------------

def airwater_pt(tp: ThermoParams, qt, p, T):
    """ql from (p, T, qt) (THERMO_AIRWATER_PT, thermo_airwater.f90:39-68):
    qsat as vapor content 1/(p/psat - 1) rd_ov_rv (1 - qt); optional
    dsmooth softplus smoothing of the phase transition."""
    ps = tp.psat(T)
    qvsat = 1.0 / (p / ps - 1.0) * tp.rd_ov_rv * (1.0 - qt)
    ql = jnp.where(qvsat >= qt, 0.0, qt - qvsat)
    if tp.dsmooth > 0.0:
        qs_r = qvsat / (1.0 - qt)
        dqldqt = 1.0 + qs_r
        qs_true = qs_r / (1.0 + qs_r)
        dsl = tp.dsmooth * qs_true
        ql = dsl * dqldqt * jnp.logaddexp((qt - qs_true) / dsl, 0.0)
    return ql


def _newton_psat_poly(coeffs_mod, T, nr=3):
    """Newton iterations on sum_i b_i T^{i-1} = 0 with per-point
    coefficient arrays (the reference's B_LOC pattern)."""
    err = None
    for _ in range(nr):
        F = coeffs_mod[-1]
        D = jnp.zeros_like(T)
        for i in range(len(coeffs_mod) - 2, -1, -1):
            F = F * T + coeffs_mod[i]
            D = D * T + coeffs_mod[i + 1] * (i + 1)
        step = F / D
        T = T - step
        err = jnp.abs(step) / jnp.abs(T)
    return T, err


def airwater_rp(tp: ThermoParams, qt, p, rho, nr: int = 3):
    """(T, ql) from (rho, p, qt) via the thermal EOS
    (THERMO_AIRWATER_RP, thermo_airwater.f90:74-209, dsmooth=0 branch).

    Unsaturated: T = p/(rho R(qt, 0)); saturated points re-solve
    psat(T) = p - (1-qt) rho Rd T (Newton on the polynomial)."""
    cf = tp.psat_cf
    Rd, Rv, Rdv = tp.Rd, tp.Rv, tp.Rdv
    T0 = p / (rho * (Rd + qt * Rdv))
    qsat0 = tp.psat(T0) / (rho * T0 * Rv)
    saturated = qsat0 <= qt

    # saturated branch: polynomial root with modified b1, b2
    b = [jnp.broadcast_to(jnp.asarray(c, T0.dtype), T0.shape) for c in cf]
    b[0] = b[0] - p
    b[1] = b[1] + (1.0 - qt) * rho * Rd
    T_sat, err = _newton_psat_poly(b, T0, nr=nr)
    qsat_sat = psat_polynomial(cf, T_sat) / (rho * T_sat * Rv)
    T = jnp.where(saturated, T_sat, T0)
    ql = jnp.where(saturated, qt - qsat_sat, 0.0)
    return T, ql, err


def airwater_re(tp: ThermoParams, qt, e, rho, nr: int = 3):
    """(T, ql) from (rho, e, qt) via the caloric EOS
    (THERMO_AIRWATER_RE, thermo_airwater.f90:254-425, dsmooth=0 branch).

    Unsaturated: T = (e - Ld - qt Ldv)/(Cv_mix); saturated points solve
    psat(T) (Lvl + HEAT_CAPACITY_LV T) + rho Rv T [...] = 0."""
    cf = tp.psat_cf
    ci = tp.cratio_inv
    Cd, Cdv, Cvl, Cdl = tp.Cd, tp.Cdv, tp.Cvl, tp.Cdl
    Rd, Rv, Rdv = tp.Rd, tp.Rv, tp.Rdv
    Ld, Ldv, Lv, Lvl, Ldl = tp.Ld, tp.Ldv, tp.Lv, tp.Lvl, tp.Ldl

    cpm = Cd + qt * Cdv
    rm = Rd + qt * Rdv
    T0 = (e - (Ld + qt * Ldv)) / (cpm - rm * ci)
    qsat0 = tp.psat(T0) / (rho * T0 * Rv)
    saturated = qsat0 < qt

    # saturated: B = psat*Lvl (+ shifted HEAT_CAPACITY_LV) + rho Rv terms
    hc_lv = Cvl + ci * Rv
    hc_ld = Cdl + ci * Rd
    n = len(cf)
    b = [jnp.broadcast_to(jnp.asarray(c * Lvl, T0.dtype), T0.shape)
         for c in cf] + [jnp.zeros_like(T0)]
    for i in range(1, n + 1):
        b[i] = b[i] + cf[i - 1] * hc_lv
    b[1] = b[1] + rho * Rv * (e - qt * Ldl - Ld)
    b[2] = b[2] - rho * Rv * (qt * hc_ld + Cd - ci * Rd)
    T_sat, err = _newton_psat_poly(b, T0, nr=nr)
    qsat_sat = psat_polynomial(cf, T_sat) / (rho * T_sat * Rv)
    T = jnp.where(saturated, T_sat, T0)
    ql = jnp.where(saturated, qt - qsat_sat, 0.0)
    # NEWTONRAPHSON_ERROR only tracks points that took the saturated
    # Newton branch (thermo_airwater.f90:266, 300-325)
    err = jnp.where(saturated, err, 0.0)
    return T, ql, err


def thermal_density(tp: ThermoParams, qt, ql, p, T):
    """rho = p/(R_mix T) (THERMO_THERMAL_DENSITY)."""
    return p / (mixture_R(tp, qt, ql) * T)


def thermal_pressure(tp: ThermoParams, qt, ql, rho, T):
    """p = rho R_mix T (THERMO_THERMAL_PRESSURE, airwater branch)."""
    return rho * mixture_R(tp, qt, ql) * T


def caloric_enthalpy(tp: ThermoParams, qt, ql, T):
    """h(T, q) = (Cd + qt Cdv + ql Cvl) T + Ld + qt Ldv + ql Lvl
    (THERMO_CALORIC_ENTHALPY airwater branch, thermo_caloric.f90)."""
    return ((tp.Cd + qt * tp.Cdv + ql * tp.Cvl) * T
            + tp.Ld + qt * tp.Ldv + ql * tp.Lvl)


def caloric_energy(tp: ThermoParams, qt, ql, T):
    """e(T, q) = h(T, q) - CRATIO_INV R_mix T (THERMO_CALORIC_ENERGY
    airwater branch): internal energy in the reference's cp T0 units."""
    return (caloric_enthalpy(tp, qt, ql, T)
            - tp.cratio_inv * mixture_R(tp, qt, ql) * T)


def compressible_airwater_params(mach: float, dsmooth: float = 0.0,
                                 **kw) -> ThermoParams:
    """ThermoParams in the reference's compressible-AirWater units
    (thermodynamics.f90:543-549): gama0 = Cpd/(Cpd - Rd) from the
    property tables (overrides any INI HeatCapacityRatio when a mixture
    is selected, :505-507), gas constants and psat scaled by
    RRATIO = 1/(gama0 M^2), CRATIO_INV = (gama0-1) M^2."""
    base = ThermoParams(**kw)
    gama0 = base.Cpd_dim / (base.Cpd_dim - base.Rd_dim)
    return dataclasses.replace(
        base, mixture="airwater", dsmooth=dsmooth,
        rratio=1.0 / (gama0 * mach ** 2),
        cratio_inv=(gama0 - 1.0) * mach ** 2)


def hydrostatic_background_compressible(tp: ThermoParams, y: np.ndarray,
                                        h_prof: np.ndarray,
                                        qt_prof: np.ndarray,
                                        p_ref: float, y_ref: float,
                                        g2: float, d1y: np.ndarray = None,
                                        niter: int = 10):
    """Compressible-branch Gravity_Hydrostatic_Enthalpy
    (gravity.f90:121-227, THERMO_TYPE_COMPRESSIBLE path): iterate
    T, ql = AIRWATER_PH_RE(qt, p, h); integrate d ln p/dy = g2/(R T)
    with the same cumulative-integral operator as the anelastic branch;
    normalize p(yref) = pref. g2 = buoyancy vector y-component / Froude
    (negative for downward gravity). Returns (ny,) profiles."""
    ny = y.shape[0]
    if d1y is not None:
        D = np.array(d1y, dtype=np.float64)
        D[0, :] = 0.0
        D[0, 0] = 1.0

        def cumint(f):
            rhs = np.array(f, dtype=np.float64)
            rhs[0] = 0.0
            return np.linalg.solve(D, rhs)
    else:
        dy_ = np.diff(y)

        def cumint(f):
            out = np.zeros_like(f)
            out[1:] = np.cumsum(0.5 * (f[1:] + f[:-1]) * dy_)
            return out

    h64 = np.asarray(h_prof, np.float64)
    qt64 = np.asarray(qt_prof, np.float64)
    p = np.full(ny, p_ref, dtype=np.float64)
    T = np.ones(ny)
    ql = np.zeros(ny)
    for _ in range(max(niter, 1)):
        Tj, qlj, _ = airwater_ph_re(tp, jnp.asarray(qt64), jnp.asarray(p),
                                    jnp.asarray(h64))
        T = np.asarray(Tj, np.float64)
        ql = np.asarray(qlj, np.float64)
        # r_aux = g2 * (1/(R T)) (THERMO_THERMAL_DENSITY at p=1)
        R = np.asarray(mixture_R(tp, qt64, ql), np.float64)
        lnp = cumint(g2 / (R * T))
        p = np.exp(lnp)
        p *= p_ref / np.interp(y_ref, y, p)
    R = np.asarray(mixture_R(tp, qt64, ql), np.float64)
    rho = p / (R * T)
    return {"p": p, "T": T, "rho": rho, "ql": ql}


def airwater_ph_re(tp: ThermoParams, qt, p, h, niter: int = 5,
                   nr: int = 3):
    """(T, ql) from (p, h, qt): iterative (rho, e) method
    (THERMO_AIRWATER_PH_RE, thermo_airwater.f90:213-249)."""
    ci = tp.cratio_inv
    ql = jnp.zeros_like(h)
    T = (h - tp.Ld - qt * tp.Ldv) / (tp.Cd + qt * tp.Cdv)
    err = None
    for _ in range(niter):
        rho = thermal_density(tp, qt, ql, p, T)
        e = h - ci * p / rho
        T, ql, err = airwater_re(tp, qt, e, rho, nr=nr)
    return T, ql, err


# ---------------------------------------------------------------------------
# Linearized stratocumulus thermodynamics (MIXT_TYPE_AIRWATER_LINEAR,
# reference THERMO_AIRWATER_LINEAR, thermo_airwater.f90:483-516): the
# normalized liquid from the mixing variables chi (s1) and psi (s2).
# ---------------------------------------------------------------------------

def airwater_linear(thermo_param, s):
    """l = max(1 + c1 chi [+ c2 psi], 0), optionally softplus-smoothed by
    c_{n+1} (s: (ns, ...) stacked scalars)."""
    n_mix = min(s.shape[0], 2)
    xi = 1.0 + thermo_param[0] * s[0]
    if n_mix > 1 and len(thermo_param) > 1:
        xi = xi + thermo_param[1] * s[1]
    # smoothing factor is thermo_param(inb_scal + 1) -- indexed by the
    # PROGNOSTIC scalar count even when xi only uses the first two
    # (thermo_airwater.f90:500-506)
    i_smooth = s.shape[0]
    dsm = thermo_param[i_smooth] if len(thermo_param) > i_smooth else 0.0
    if abs(dsm) < 1e-30:
        return jnp.maximum(xi, 0.0)
    return dsm * jnp.logaddexp(xi / dsm, 0.0)


def airwater_linear_source(thermo_param, s):
    """(xi, dl/dxi, d2l/dxi2-like smoothing weight) for the linearized
    evaporative source (THERMO_AIRWATER_LINEAR_SOURCE,
    thermo_airwater.f90:520-560)."""
    n_mix = min(s.shape[0], 2)
    xi = 1.0 + thermo_param[0] * s[0]
    if n_mix > 1 and len(thermo_param) > 1:
        xi = xi + thermo_param[1] * s[1]
    i_smooth = s.shape[0]
    dsm = thermo_param[i_smooth] if len(thermo_param) > i_smooth else 0.0
    if abs(dsm) < 1e-30:
        der1 = jnp.where(xi <= 0.0, 0.0, 1.0)
        der2 = jnp.zeros_like(xi)
    else:
        sig = 1.0 / (1.0 + jnp.exp(-xi / dsm))
        der1 = sig
        der2 = sig * (1.0 - sig) / dsm
    return xi, der1, der2
