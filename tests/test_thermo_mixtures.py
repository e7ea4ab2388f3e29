"""Mixture thermodynamics vs the reference formulation
(src/thermodynamics/thermodynamics.f90, thermo_airwater.f90):
Flatau saturation-pressure polynomial, airwater PT/RP/RE/PH_RE
equilibrium variants, linearized stratocumulus mixture."""
import numpy as np
import jax.numpy as jnp

from tlab_tpu.physics import thermo
from tlab_tpu.physics.thermo import ThermoParams


def test_psat_polynomial_matches_flatau_direct():
    """The re-expanded nondimensional polynomial (thermodynamics.f90:
    473-489) equals the direct Flatau evaluation in powers of (T-273.15)
    to round-off over the atmospheric range."""
    T_ref, p_ref = 298.0, 1.0e5
    cf = thermo.psat_coeffs(T_ref, p_ref)
    T_dim = np.linspace(230.0, 330.0, 101)
    direct = np.zeros_like(T_dim)
    for i, a in enumerate(thermo.FLATAU):
        direct += a * (T_dim - 273.15) ** i
    direct /= p_ref
    ours = np.asarray(thermo.psat_polynomial(cf, jnp.asarray(T_dim / T_ref)))
    # the re-expansion is mildly ill-conditioned (alternating-sign sums);
    # the reference's own f64 conversion carries the same round-off
    assert np.max(np.abs(ours - direct) / direct) < 5e-9
    # value sanity: psat(273.15 K) = 611.21 Pa (Flatau constant term)
    v0 = float(thermo.psat_polynomial(cf, jnp.asarray(273.15 / T_ref)))
    assert abs(v0 * p_ref - 611.213476) < 1e-3


def test_dpsat_consistent_with_psat():
    import jax
    cf = thermo.psat_coeffs()
    grad = jax.vmap(jax.grad(lambda t: thermo.psat_polynomial(cf, t)))
    T = jnp.linspace(0.85, 1.05, 41)
    dp = np.asarray(thermo.dpsat_polynomial(cf, T))
    ad = np.asarray(grad(T))
    assert np.max(np.abs(dp - ad) / np.abs(ad)) < 1e-10


def test_reference_constants():
    """Nondimensional constants match the reference definitions
    (thermodynamics.f90:570-585)."""
    tp = ThermoParams()
    assert abs(tp.rd_ov_rv - 18.015 / 28.9644) < 1e-12
    assert abs(tp.Rd - (8314.0 / 28.9644) / 1007.0) < 1e-12
    assert abs(tp.Cdv - (1870.0 / 1007.0 - 1.0)) < 1e-12
    assert abs(tp.Cvl - (4217.6 - 1870.0) / 1007.0) < 1e-12
    # Lv0 = latent heat extrapolated to T=0 through constant heat caps
    lv0_dim = 2501600.0 + (4217.6 - 1870.0) * 273.15
    assert abs(tp.Lv0 - lv0_dim / (1007.0 * 298.0)) < 1e-12
    assert tp.Lv == 0.0 and tp.Ld == 0.0 and tp.Ldv == 0.0
    assert abs(tp.Lvl + tp.Lv0) < 1e-12 and abs(tp.Ldl + tp.Lv0) < 1e-12


def test_airwater_rp_consistency():
    """Construct a saturated (T*, ql*) state, derive (rho, p), and check
    RP recovers it (THERMO_AIRWATER_RP, thermal EOS + psat Newton)."""
    tp = ThermoParams()
    T_star = 0.95                      # ~283 K
    qt = 0.02
    ps = float(tp.psat(jnp.asarray(T_star)))
    qv_star = 0.015
    rho = ps / (qv_star * T_star * tp.Rv)
    ql_star = qt - qv_star
    p = rho * T_star * (tp.Rd * (1.0 - qt) + tp.Rv * qv_star)
    T, ql, err = thermo.airwater_rp(tp, jnp.asarray(qt), jnp.asarray(p),
                                    jnp.asarray(rho))
    assert abs(float(T) - T_star) < 1e-10
    assert abs(float(ql) - ql_star) < 1e-10
    # unsaturated state: ql = 0, T from thermal EOS directly
    qt_dry = 0.005
    p_dry = rho * T_star * (tp.Rd + qt_dry * tp.Rdv)
    T2, ql2, _ = thermo.airwater_rp(tp, jnp.asarray(qt_dry),
                                    jnp.asarray(p_dry), jnp.asarray(rho))
    assert float(ql2) == 0.0
    assert abs(float(T2) - T_star) < 1e-12


def test_airwater_re_consistency():
    """Saturated (T*, ql*) state recovered from (rho, e, qt)
    (THERMO_AIRWATER_RE, caloric EOS)."""
    tp = ThermoParams()
    T_star, qt = 0.93, 0.0135
    ps = float(tp.psat(jnp.asarray(T_star)))
    qv = 0.012
    rho = ps / (qv * T_star * tp.Rv)
    ql = qt - qv                       # realistic cloud liquid ~1.5e-3
    ci = tp.cratio_inv
    cpm = tp.Cd + qt * tp.Cdv + ql * tp.Cvl
    rm = tp.Rd + qt * tp.Rdv - ql * tp.Rv
    # e = h - ci p/rho with h = cp_m T - ql Lv0; p = rho rm T
    e = cpm * T_star - ql * tp.Lv0 - ci * rm * T_star
    T, qlr, err = thermo.airwater_re(tp, jnp.asarray(qt), jnp.asarray(e),
                                     jnp.asarray(rho))
    # nrmax=3 as the reference: converged for realistic supersaturation
    assert abs(float(T) - T_star) < 1e-7
    assert abs(float(qlr) - ql) < 1e-7
    # strongly supersaturated states need more iterations (exposed nr)
    qt2 = 0.025
    ql2 = qt2 - qv
    cpm2 = tp.Cd + qt2 * tp.Cdv + ql2 * tp.Cvl
    rm2 = tp.Rd + qt2 * tp.Rdv - ql2 * tp.Rv
    e2 = cpm2 * T_star - ql2 * tp.Lv0 - ci * rm2 * T_star
    T2, qlr2, _ = thermo.airwater_re(tp, jnp.asarray(qt2), jnp.asarray(e2),
                                     jnp.asarray(rho), nr=25)
    assert abs(float(T2) - T_star) < 1e-8
    assert abs(float(qlr2) - ql2) < 1e-8


def test_airwater_ph_re_matches_masked_newton():
    """The reference's iterative (rho,e) route and our anelastic masked
    Newton solve the SAME (p, h) problem: results agree."""
    tp = ThermoParams()
    rng = np.random.default_rng(5)
    n = 64
    p = jnp.asarray(0.7 + 0.3 * rng.random(n))
    T_tgt = jnp.asarray(0.88 + 0.1 * rng.random(n))
    qs0 = tp.qsat(T_tgt, p)
    # realistic states: half mildly supersaturated (ql <= 2e-3), half
    # unsaturated -- the regime both fixed-count iterations handle
    sat = rng.random(n) < 0.5
    qt = jnp.where(jnp.asarray(sat),
                   qs0 + 2e-3 * rng.random(n), 0.5 * qs0)
    qs = tp.qsat(T_tgt, p)
    ql_t = jnp.clip(qt - qs, 0.0, None)
    h = (tp.Cd + qt * tp.Cdv + ql_t * tp.Cvl) * T_tgt - ql_t * tp.Lv0
    T1, ql1 = thermo.equilibrium_T_ql(tp, h, qt, p, jnp.zeros_like(h))
    T2, ql2, err = thermo.airwater_ph_re(tp, qt, p, h, niter=8, nr=6)
    assert np.max(np.abs(np.asarray(T1 - T2))) < 2e-6
    assert np.max(np.abs(np.asarray(ql1 - ql2))) < 2e-6


def test_airwater_pt():
    tp = ThermoParams()
    T = jnp.asarray(0.95)
    p = jnp.asarray(1.0)
    ps = float(tp.psat(T))
    qv_sat = 1.0 / (1.0 / ps - 1.0) * tp.rd_ov_rv * (1.0 - 0.03)
    ql = thermo.airwater_pt(tp, jnp.asarray(0.03), p, T)
    assert abs(float(ql) - (0.03 - qv_sat)) < 1e-12
    assert float(thermo.airwater_pt(tp, jnp.asarray(0.001), p, T)) == 0.0
    # smoothing keeps ql positive and close near the transition
    tps = ThermoParams(dsmooth=0.1)
    qls = thermo.airwater_pt(tps, jnp.asarray(0.03), p, T)
    assert float(qls) > 0.0


def test_airwater_linear():
    """MIXT_TYPE_AIRWATER_LINEAR (thermo_airwater.f90:483-516): Case16's
    parameters give l = max(1 - 11.11 chi, 0) etc."""
    par = (-11.111111111, 0.0056250)
    s = jnp.asarray(np.linspace(0.0, 0.2, 21))[None]
    liq = np.asarray(thermo.airwater_linear(par, s))
    # with inb_scal=1, Parameters(2) is the SMOOTHING factor
    # (thermo_param(inb_scal+1), thermo_airwater.f90:500-513)
    xi = 1.0 + par[0] * np.asarray(s[0])
    expect = par[1] * np.logaddexp(xi / par[1], 0.0)
    assert np.allclose(liq, expect)
    # sharp variant: no smoothing parameter -> max(xi, 0)
    liq_sharp = np.asarray(thermo.airwater_linear((-11.111111111,), s))
    assert np.allclose(liq_sharp, np.maximum(xi, 0.0))
    # smoothed variant (3rd parameter) stays positive and approaches the
    # kink solution away from it
    par_s = (-11.111111111, 0.0, 0.01)
    s2 = jnp.stack([s[0], jnp.zeros_like(s[0])])
    liq_s = np.asarray(thermo.airwater_linear(par_s, s2))
    assert (liq_s > 0).all()
    assert abs(liq_s[0] - expect[0]) < 0.01


def test_case16_airwaterlinear_simulation_runs():
    """Case16-style linearized stratocumulus: buoyancy couples to the
    diagnostic liquid; a few steps stay finite and produce buoyancy
    forcing."""
    import jax
    from tlab_tpu.config import load_case, Ini
    from tlab_tpu.runtime import Simulation
    from tlab_tpu.dycore import incompressible as dyn
    from tlab_tpu.dycore.state import State
    txt = open("/root/reference/examples/Case16/tlab.ini").read()
    # shrink the grid for test speed, keep all physics keys
    txt = txt.replace("Imax=256", "Imax=32").replace("Jmax=512", "Jmax=48")
    txt = txt.replace("points_1=257", "points_1=33")
    txt = txt.replace("points_1=512", "points_1=48")
    sim = Simulation.from_case(load_case(Ini(text=txt)))
    nx, ny, nz = sim.grid.shape
    y = sim.grid.y.nodes
    prof = sim.case.scal_profiles[0](y)
    s0 = jnp.broadcast_to(jnp.asarray(prof)[None, :, None], (nx, ny, nz))
    z3 = jnp.zeros((nx, ny, nz))
    state = State(u=z3, v=z3, w=z3, s=s0[None])
    step = jax.jit(lambda st: dyn.rk_step(sim.P, st, 1e-4)[0])
    for _ in range(3):
        state = step(state)
    assert np.isfinite(np.asarray(state.v)).all()
    assert float(jnp.max(jnp.abs(state.v))) > 0.0
