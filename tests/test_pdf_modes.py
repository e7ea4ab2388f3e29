"""pdfs.x ParamPdfs analysis modes 1-15 (reference
src/tools/statistics/pdfs.f90:193-800): every mode's 3-D fields match
independent NumPy computations, and the written pdf<it>.<tag> files parse
in the reference binary layout."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from tlab_tpu.config import load_case, Ini
from tlab_tpu.dycore.state import State
from tlab_tpu.io import reference_formats as rf
from tlab_tpu.runtime import Simulation
from tlab_tpu.stats import pdfs

INI = """
[Main]
Type=temporal
Equations=incompressible
SpaceOrder=CompactJacobian6
TimeOrder=RungeKuttaExplicit3
TimeCFL=0.8
[Parameters]
Reynolds=500
Schmidt=1.0
Froude=2.0
[BoundaryConditions]
VelocityJmin=freeslip
VelocityJmax=freeslip
Scalar1Jmin=neumann
Scalar1Jmax=neumann
[Scalar]
ProfileScalar1=Tanh
ThickScalar1=0.1
DeltaScalar1=1.0
MeanScalar1=0.5
[BodyForce]
Type=Linear
Vector=0.0,-1.0,0.0
Parameters=1.0
[IniGridOx]
periodic=yes
segments=1
points_1=25
scales_1=2.0
opts_1=uniform
[IniGridOy]
periodic=no
segments=1
points_1=32
scales_1=1.0
opts_1=uniform
[IniGridOz]
periodic=yes
segments=1
points_1=17
scales_1=1.0
opts_1=uniform
"""


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    sim = Simulation.from_case(load_case(Ini(text=INI)))
    rng = np.random.default_rng(5)
    shp = sim.grid.shape
    y = sim.grid.y.nodes
    env = np.sin(np.pi * y)[None, :, None]

    def f(a=0.3):
        return jnp.asarray(a * env * rng.standard_normal(shp))

    st = State(u=jnp.asarray(np.tanh((y[None, :, None] - 0.5) / 0.2)
                             * np.ones(shp)) + f(),
               v=f(), w=f(), s=(0.5 + f(0.2))[None])
    from tlab_tpu.dycore.pressure import pressure_boussinesq
    p = pressure_boussinesq(sim.P, st)
    out = str(tmp_path_factory.mktemp("pdfmodes"))
    return sim, st, p, out


def _fields(setup, mode):
    sim, st, p, out = setup
    singles, joints = pdfs.mode_fields(sim, st, p, mode)
    return dict(singles), {t: (a, b) for t, a, b in joints}


def _close(got, ref, tag, tol=1e-11):
    got = np.asarray(got)
    scale = max(1.0, float(np.max(np.abs(ref))))
    assert np.max(np.abs(got - ref)) < tol * scale, tag


def _np_grad(sim, a, axis_name, axis):
    M = np.asarray(sim.P[f"d1{axis_name}"], np.float64)
    eins = {0: "ab,bjk->ajk", 1: "ab,ibk->iak", 2: "ab,ijb->ija"}[axis]
    return np.einsum(eins, M, np.asarray(a, np.float64))


def _np_grad9(sim, st):
    g = {}
    for cname, comp in (("u", st.u), ("v", st.v), ("w", st.w)):
        for aname, ax in (("x", 0), ("y", 1), ("z", 2)):
            g[cname + aname] = _np_grad(sim, comp, aname, ax)
    return g


def _np_curl(sim, st):
    g = _np_grad9(sim, st)
    return (g["wy"] - g["vz"], g["uz"] - g["wx"], g["vx"] - g["uy"])


def _np_lap(sim, a):
    """Compact Laplacian from the stacked [D1;D2] operators' lower half."""
    out = np.zeros(np.asarray(a, np.float64).shape)
    for aname, ax in (("x", 0), ("y", 1), ("z", 2)):
        d12 = np.asarray(sim.P[f"d12{aname}"], np.float64)
        n = a.shape[ax]
        D2 = d12[n:]
        eins = {0: "ab,bjk->ajk", 1: "ab,ibk->iak", 2: "ab,ijb->ija"}[ax]
        out = out + np.einsum(eins, D2, np.asarray(a, np.float64))
    return out


def test_mode1_main_variables(setup):
    f, j = _fields(setup, 1)
    assert set(f) == {"u", "v", "w", "p", "s1"}
    sim, st, p, out = setup
    _close(f["u"], np.asarray(st.u), "u")


def test_mode2_scalar_gradient_equation(setup):
    sim, st, p, out = setup
    f, j = _fields(setup, 2)
    g = [_np_grad(sim, st.s[0], a, i)
         for a, i in (("x", 0), ("y", 1), ("z", 2))]
    gigi = g[0] ** 2 + g[1] ** 2 + g[2] ** 2
    _close(f["GiGi"], gigi, "GiGi")
    gv = _np_grad9(sim, st)
    prod = -(g[0] * g[0] * gv["ux"] + g[1] * g[1] * gv["vy"]
             + g[2] * g[2] * gv["wz"]
             + g[0] * g[1] * (gv["uy"] + gv["vx"])
             + g[0] * g[2] * (gv["uz"] + gv["wx"])
             + g[1] * g[2] * (gv["vz"] + gv["wy"]))
    _close(f["ProductionMsGiGjSij"], prod, "prod")
    diffu = sim.nsp.diffusivity(0) * (
        g[0] * _np_lap(sim, g[0]) + g[1] * _np_lap(sim, g[1])
        + g[2] * _np_lap(sim, g[2]))
    _close(f["DiffusionNuGiLapGi"], diffu, "diff")
    _close(f["StrainAMsNiNjSij"], prod / (gigi + 1e-300), "rate")


def test_mode3_enstrophy_equation(setup):
    sim, st, p, out = setup
    f, j = _fields(setup, 3)
    wx, wy, wz = _np_curl(sim, st)
    wiwi = wx * wx + wy * wy + wz * wz
    _close(f["WiWi"], wiwi, "WiWi")
    g = _np_grad9(sim, st)
    prod = (wx * wx * g["ux"] + wy * wy * g["vy"] + wz * wz * g["wz"]
            + wx * wy * (g["uy"] + g["vx"])
            + wx * wz * (g["uz"] + g["wx"])
            + wy * wz * (g["vz"] + g["wy"]))
    _close(f["ProductionWiWjSij"], prod, "prod")
    diffu = sim.nsp.visc * (wx * _np_lap(sim, wx) + wy * _np_lap(sim, wy)
                            + wz * _np_lap(sim, wz))
    _close(f["DiffusionNuWiLapWi"], diffu, "diff")
    div = g["ux"] + g["vy"] + g["wz"]
    _close(f["DilatationMsWiWiDivU"], -div * wiwi, "dil")
    # baroclinic: curl of (0, b g_y/Fr, 0) dotted with vorticity;
    # b = Parameters[0]*s1 (linear type), vector=(0,-1,0)/Froude=2
    bf = -0.5 * np.asarray(st.s[0])
    baro = (wx * (-_np_grad(sim, bf, "z", 2))
            + wz * _np_grad(sim, bf, "x", 0))
    _close(f["Baroclinic"], baro, "baro")
    _close(f["RateANiNjSij"], prod / (wiwi + 1e-300), "rate")


def test_mode4_strain_equation(setup):
    sim, st, p, out = setup
    f, j = _fields(setup, 4)
    g = _np_grad9(sim, st)
    s2 = (g["ux"] ** 2 + g["vy"] ** 2 + g["wz"] ** 2
          + 0.5 * ((g["uy"] + g["vx"]) ** 2 + (g["uz"] + g["wx"]) ** 2
                   + (g["vz"] + g["wy"]) ** 2))
    _close(f["2SijSij"], 2.0 * s2, "2SijSij")
    s12 = 0.5 * (g["uy"] + g["vx"])
    s13 = 0.5 * (g["uz"] + g["wx"])
    s23 = 0.5 * (g["vz"] + g["wy"])
    wx, wy, wz = _np_curl(sim, st)
    vp = (wx * wx * g["ux"] + wy * wy * g["vy"] + wz * wz * g["wz"]
          + wx * wy * 2 * s12 + wx * wz * 2 * s13 + wy * wz * 2 * s23)
    sss = (2.0 * s12 * s13 * s23
           + g["ux"] * (g["ux"] ** 2 + 3.0 * (s12 ** 2 + s13 ** 2))
           + g["vy"] * (g["vy"] ** 2 + 3.0 * (s12 ** 2 + s23 ** 2))
           + g["wz"] * (g["wz"] ** 2 + 3.0 * (s13 ** 2 + s23 ** 2)))
    _close(f["ProductionMs2SijSjkS_ki"], -2.0 * (0.25 * vp + sss), "prod")
    # diffusion 2 nu s_ij lap s_ij
    diffu = (g["ux"] * _np_lap(sim, g["ux"])
             + g["vy"] * _np_lap(sim, g["vy"])
             + g["wz"] * _np_lap(sim, g["wz"]))
    for t in (g["uy"] + g["vx"], g["uz"] + g["wx"], g["vz"] + g["wy"]):
        diffu = diffu + 0.5 * t * _np_lap(sim, t)
    _close(f["DiffusionNuSijLapSij"], 2.0 * sim.nsp.visc * diffu, "diff")
    # pressure-strain: -2 s_ij p,ij
    pnp = np.asarray(p, np.float64)
    px = _np_grad(sim, pnp, "x", 0)
    py = _np_grad(sim, pnp, "y", 1)
    d12x = np.asarray(sim.P["d12x"], np.float64)
    nx, ny, nz = pnp.shape
    pxx = np.einsum("ab,bjk->ajk", d12x[nx:], pnp)
    pyy = np.einsum("ab,ibk->iak", np.asarray(sim.P["d12y"],
                                              np.float64)[ny:], pnp)
    pzz = np.einsum("ab,ijb->ija", np.asarray(sim.P["d12z"],
                                              np.float64)[nz:], pnp)
    sp = (g["ux"] * pxx + g["vy"] * pyy + g["wz"] * pzz
          + _np_grad(sim, px, "y", 1) * (g["vx"] + g["uy"])
          + _np_grad(sim, px, "z", 2) * (g["wx"] + g["uz"])
          + _np_grad(sim, py, "z", 2) * (g["wy"] + g["vz"]))
    _close(f["Pressure2SijPij"], -2.0 * sp, "press")


def test_mode6_chi_flamelet(setup):
    sim, st, p, out = setup
    f, j = _fields(setup, 6)
    n = [_np_grad(sim, st.s[0], a, i)
         for a, i in (("x", 0), ("y", 1), ("z", 2))]
    g = _np_grad9(sim, st)
    strain1 = (n[0] * (n[0] * g["ux"] + n[1] * g["uy"] + n[2] * g["uz"])
               + n[1] * (n[0] * g["vx"] + n[1] * g["vy"] + n[2] * g["vz"])
               + n[2] * (n[0] * g["wx"] + n[1] * g["wy"] + n[2] * g["wz"]))
    _close(f["StrainAGiGi"], strain1, "strain1")
    g2 = n[0] ** 2 + n[1] ** 2 + n[2] ** 2
    strain2 = np.where(g2 > 0, strain1 / np.where(g2 > 0, g2, 1.0), strain1)
    _close(f["StrainA"], strain2, "strain2")


def test_mode11_eigenvalues(setup):
    sim, st, p, out = setup
    f, j = _fields(setup, 11)
    g = _np_grad9(sim, st)
    S = np.zeros(np.asarray(st.u).shape + (3, 3))
    S[..., 0, 0] = g["ux"]; S[..., 1, 1] = g["vy"]; S[..., 2, 2] = g["wz"]
    S[..., 0, 1] = S[..., 1, 0] = 0.5 * (g["uy"] + g["vx"])
    S[..., 0, 2] = S[..., 2, 0] = 0.5 * (g["uz"] + g["wx"])
    S[..., 1, 2] = S[..., 2, 1] = 0.5 * (g["vz"] + g["wy"])
    lam = np.sort(np.linalg.eigvalsh(S), axis=-1)[..., ::-1]
    for i, tag in enumerate(("Lambda1", "Lambda2", "Lambda3")):
        _close(f[tag], lam[..., i], tag, tol=1e-8)


def test_mode12_eigenframe(setup):
    sim, st, p, out = setup
    f, j = _fields(setup, 12)
    assert set(f) == {"cos(w,lambda1)", "cos(w,lambda2)", "cos(w,lambda3)",
                      "cos(G,lambda1)", "cos(G,lambda2)", "cos(G,lambda3)"}
    for tag, a in f.items():
        a = np.asarray(a)
        assert np.all(np.abs(a) <= 1.0 + 1e-10), tag
    # the three cosines of each vector span an orthonormal frame
    sq = sum(np.asarray(f[f"cos(w,lambda{i})"]) ** 2 for i in (1, 2, 3))
    assert np.max(np.abs(sq - 1.0)) < 1e-8


def test_mode13_longitudinal(setup):
    sim, st, p, out = setup
    f, j = _fields(setup, 13)
    _close(f["Sxx"], _np_grad(sim, st.u, "x", 0), "Sxx")
    _close(f["Syy"], _np_grad(sim, st.v, "y", 1), "Syy")
    _close(f["Szz"], _np_grad(sim, st.w, "z", 2), "Szz")


def test_mode14_potential_vorticity(setup):
    sim, st, p, out = setup
    f, j = _fields(setup, 14)
    wx, wy, wz = _np_curl(sim, st)
    n = [_np_grad(sim, st.s[0], a, i)
         for a, i in (("x", 0), ("y", 1), ("z", 2))]
    pv = wx * n[0] + wy * n[1] + wz * n[2]
    # compare pv^2 (the log amplifies roundoff near the zero crossings
    # of pv, where log(pv^2) legitimately differs between summation
    # orders)
    _close(np.exp(np.asarray(f["LnPotentialEnstrophy"])), pv * pv, "pv2")
    cos = np.asarray(f["CosPotentialEnstrophy"])
    assert np.all(np.abs(cos) <= 1.0 + 1e-10)


def test_mode15_joint_bv(setup):
    sim, st, p, out = setup
    f, j = _fields(setup, 15)
    # linear buoyancy b = s1 (Parameters=1), then scaled 1/Froude = 1/2
    _close(f["b"], np.asarray(st.s[0]) / 2.0, "b")
    _close(f["v"], np.asarray(st.v), "v")
    assert "bv" in j


def test_all_modes_write_reference_files(setup):
    sim, st, p, out = setup
    expect_joint = {5: "RQ", 7: "WS", 9: "SLnG", 10: "GphiS", 15: "bv"}
    for mode in (1, 2, 3, 4, 5, 6, 7, 9, 10, 11, 12, 13, 14, 15):
        pdfs.run_pdf_mode(sim, st, p, out, 77, 1.25, opt_main=mode,
                          nbins=(16, 16))
        singles, joints = pdfs.mode_fields(sim, st, p, mode)
        for tag, _a in singles:
            path = os.path.join(out, f"pdf77.{tag}")
            assert os.path.exists(path), (mode, tag)
            t, y, rows, nb = rf.read_pdf_file(path)
            assert rows.shape == (len(sim.grid.y.nodes) + 1, 16 + 2)
            assert abs(t - 1.25) < 1e-6
        if mode in expect_joint:
            path = os.path.join(out, f"pdf77.{expect_joint[mode]}")
            assert os.path.exists(path), mode
            t, y, rows, nb = rf.read_pdf_file(path, ndim=2)
            assert rows.shape[1] == 16 * 16 + 2 + 2 * 16


def test_unknown_mode_raises(setup):
    sim, st, p, out = setup
    with pytest.raises(NotImplementedError):
        pdfs.run_pdf_mode(sim, st, p, out, 77, 1.25, opt_main=99)


def test_cavg_tables(setup):
    """Conditional-average outputs of modes 9/15 (reference CAVG1V_N /
    CAVG2V, cavg.f90): mean(a | bin) with empty bins left at zero,
    verified against a direct NumPy binned mean."""
    sim, st, p, out = setup
    pdfs.run_pdf_mode(sim, st, p, out, 77, 1.25, opt_main=9,
                      nbins=(16, 16))
    for f in ("cavgGiGi77.s", "cavgLnGiGi77.s"):
        assert os.path.exists(os.path.join(out, f)), f
    t, y, rows, _nb = rf.read_pdf_file(os.path.join(out, "cavgGiGi77.s"))
    # independent check on the volume row (last): binned mean of GiGi
    from tlab_tpu import mappings as mp
    gigi = np.asarray(mp.gradient_magnitude2(sim.P, st.s[0])).ravel()
    s = np.asarray(st.s[0]).ravel()
    umin, umax = s.min(), s.max()
    step = (umax - umin) / 16
    up = np.minimum(((s - umin) / step).astype(np.int64), 15)
    ref = np.zeros(16)
    for k in range(16):
        m = up == k
        if m.any():
            ref[k] = gigi[m].mean()
    np.testing.assert_allclose(rows[-1, :16], ref.astype(np.float32),
                               rtol=1e-5)

    pdfs.run_pdf_mode(sim, st, p, out, 77, 1.25, opt_main=15,
                      nbins=(16, 16))
    for f in ("cavgB77.b", "cavgB77.v", "cavgB77.bv", "cavgU77.b",
              "cavgVii77.bv", "cavgP77.v", "cavgPy77.bv"):
        assert os.path.exists(os.path.join(out, f)), f
    t, y, rows2, _nb = rf.read_pdf_file(os.path.join(out, "cavgB77.bv"),
                                        ndim=2)
    assert rows2.shape[1] == 16 * 16 + 2 + 2 * 16
