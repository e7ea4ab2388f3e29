"""Anelastic moist thermodynamics validation."""
import numpy as np
import jax.numpy as jnp

from tlab_tpu.physics import thermo


TP = thermo.ThermoParams(mixture="airwater", scale_height_inv=0.01,
                         T_ref=298.0, L_ref=100.0)


def test_psat_reference_values():
    """Bolton fit vs tabulated saturation pressures (Pa)."""
    for T_K, es_ref in ((273.15, 611.2), (293.15, 2339.0), (303.15, 4246.0)):
        es = float(TP.psat(jnp.asarray(T_K / TP.T_ref))) * TP.p_ref
        assert abs(es - es_ref) / es_ref < 0.01, (T_K, es)


def test_unsaturated_equilibrium():
    """Dry-ish parcel: ql = 0 and T solves h = cp T + ep."""
    h = jnp.asarray(1.02)
    qt = jnp.asarray(0.001)
    p = jnp.asarray(1.0)
    ep = jnp.asarray(0.01)
    T, ql = thermo.equilibrium_T_ql(TP, h, qt, p, ep)
    assert float(ql) == 0.0
    cp = TP.Cd + float(qt) * TP.Cdv
    assert abs(float(T) * cp - (float(h) - float(ep))) < 1e-12


def test_saturated_equilibrium_consistency():
    """Moist parcel: Newton converges and (T, ql) satisfy both the enthalpy
    definition and ql = qt - qsat(T)."""
    h = jnp.asarray(0.97)           # ~289 K parcel
    qt = jnp.asarray(0.02)          # 20 g/kg -> saturated
    p = jnp.asarray(1.0)
    ep = jnp.asarray(0.0)
    T, ql = thermo.equilibrium_T_ql(TP, h, qt, p, ep)
    assert float(ql) > 0.0
    # equilibrium vapor: exact per-total-mass convention
    # q_v = eps psat/(p - psat) (1 - qt) (thermo_anelastic.f90:189-193)
    ps = float(TP.psat(T))
    qvequ = TP.rd_ov_rv / (1.0 / ps - 1.0) * (1.0 - float(qt))
    assert abs(float(ql) - (float(qt) - qvequ)) < 1e-9
    cp = TP.Cd + float(qt) * TP.Cdv + float(ql) * TP.Cvl
    res = cp * float(T) - float(ql) * TP.Lv0 - float(h)
    assert abs(res) < 1e-9


def test_hydrostatic_background():
    """Pressure decreases with height; rho p T consistent; buoyancy of the
    background state itself is ~0 (neutral by construction)."""
    ny = 64
    y = np.linspace(0.0, 1.0, ny)
    h_prof = 1.0 + TP.scale_height_inv * y       # constant T_v-ish profile
    qt_prof = np.full(ny, 0.008)
    bg = thermo.hydrostatic_background(TP, y, h_prof, qt_prof)
    assert np.all(np.diff(bg["p"]) < 0)
    # rho in the reference normalization: p/(R_hat T), R_hat = R/Rd
    # (Thermo_Anelastic_DENSITY with R_air = 1)
    R_hat = thermo.mixture_R(TP, qt_prof, bg["ql"]) / TP.Rd
    assert np.allclose(bg["rho"], bg["p"] / (R_hat * bg["T"]), rtol=1e-12)

    s = jnp.stack([jnp.asarray(h_prof)[None, :, None] * jnp.ones((4, ny, 3)),
                   jnp.asarray(qt_prof)[None, :, None] * jnp.ones((4, ny, 3))])
    b = thermo.buoyancy_explicit(TP, s, bg)
    assert float(jnp.max(jnp.abs(b))) < 1e-10


def test_buoyancy_sign():
    """A warmer parcel (larger h) is positively buoyant."""
    ny = 16
    y = np.linspace(0.0, 1.0, ny)
    h_prof = np.full(ny, 1.0)
    qt_prof = np.full(ny, 0.005)
    bg = thermo.hydrostatic_background(TP, y, h_prof, qt_prof)
    s_warm = jnp.stack([jnp.full((2, ny, 2), 1.01),
                        jnp.full((2, ny, 2), 0.005)])
    b = thermo.buoyancy_explicit(TP, s_warm, bg)
    assert float(jnp.min(b)) > 0.0


def test_vapor_table_and_reversal():
    """smooth.x/reversal.x equivalents: the vapor table partitions qt into
    ql + qv consistently with qsat, and a cloudy/clear mixing line shows
    buoyancy reversal (negatively buoyant intermediate mixtures)."""
    from tlab_tpu.tools import cloudstate
    tp = TP
    p = 1.0
    # cloudy parcel (1): cold, moist; environment (2): warm, dry
    h1, qt1 = 0.95, 0.02
    h2, qt2 = 1.01, 0.004
    tab = cloudstate.vapor_table(tp, p, h1, np.linspace(0.0, 0.03, 31))
    assert np.all(tab["ql"] >= -1e-14)
    assert np.allclose(tab["qt"], tab["ql"] + tab["qv"], atol=1e-12)
    # where unsaturated, ql = 0 and qv = qt < qs
    unsat = tab["qv"] < 0.98 * tab["qs"]
    assert np.all(tab["ql"][unsat] < 1e-10)

    d = cloudstate.buoyancy_reversal(tp, h1, qt1, h2, qt2, p)
    assert 0.0 <= d["chi_star"] <= 1.0
    assert d["b_star"] <= d["b"][-1] + 1e-12
    assert np.isfinite(d["chi_s"])


def test_cloud_cli_commands(tmp_path):
    """state/smooth/saturation/reversal CLI commands (the reference's
    shipped cloud executables, src/tools/CMakeLists.txt:135-143) write
    their tables and agree with the library functions."""
    from tlab_tpu.tools import cli
    import os
    out = str(tmp_path)
    assert cli.main(["state", "--cpu", "--x64", "--ini", "/nonexistent",
                     "--p", "1.0", "--h", "0.97", "--qt", "0.02",
                     "--outdir", out]) == 0
    row = np.loadtxt(os.path.join(out, "state.dat"))
    # T, ql from the equilibrium solve; qv + ql == qt; rho = p/(R T)
    assert abs(row[2] - 0.02) < 1e-12
    assert abs((row[4] + row[5]) - row[2]) < 1e-12
    assert abs(row[8] - row[0] / (row[7] * row[3])) < 1e-9

    assert cli.main(["smooth", "--cpu", "--x64", "--ini", "/nonexistent",
                     "--p", "1.0", "--h", "0.97", "--outdir", out,
                     "--range", "0.0,0.05,51"]) == 0
    tab = np.loadtxt(os.path.join(out, "vapor.dat"))
    assert tab.shape == (51, 5)
    # unsaturated rows: qv == qt; saturated rows: qv tracks qsat
    sat = tab[:, 1] > 1e-10
    assert sat.any() and (~sat).any()
    np.testing.assert_allclose(tab[~sat, 2], tab[~sat, 0], atol=1e-12)
    np.testing.assert_allclose(tab[sat, 2], tab[sat, 3], rtol=2e-2)

    assert cli.main(["saturation", "--cpu", "--x64", "--ini",
                     "/nonexistent", "--outdir", out]) == 0
    sat_tab = np.loadtxt(os.path.join(out, "sat.dat"))
    assert (np.diff(sat_tab[:, 1]) > 0).all()      # qsat rises with T

    assert cli.main(["reversal", "--cpu", "--x64", "--ini",
                     "/nonexistent", "--h", "0.94", "--qt", "0.022",
                     "--h2", "1.02", "--qt2", "0.008",
                     "--outdir", out]) == 0
    rev = np.loadtxt(os.path.join(out, "reversal.dat"))
    assert rev.shape[1] == 6 and np.isfinite(rev).all()
    hdr = open(os.path.join(out, "reversal.dat")).readline()
    assert "chi_star" in hdr and "b_star" in hdr
