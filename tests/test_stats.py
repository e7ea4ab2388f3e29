"""Statistics validation: moments, Parseval identities, PDF normalization."""
import numpy as np
import jax.numpy as jnp

from tlab_tpu.dycore import incompressible as dyn
from tlab_tpu.dycore.state import State
from tlab_tpu.fdm.plan import build_fdm_plan
from tlab_tpu.grid import uniform_grid
from tlab_tpu.physics.params import NSParams
from tlab_tpu.config import load_case, Ini
from tlab_tpu.runtime import Simulation
from tlab_tpu.stats import averages, pdfs, spectra

MINI_CASE = """
[Main]
Type=temporal
Equations=incompressible
SpaceOrder=CompactJacobian6
TimeOrder=RungeKuttaExplicit3
[Parameters]
Reynolds=100
Schmidt=1.0
[Control]
ScalLimit=no
[IniGridOx]
periodic=yes
segments=1
points_1=17
scales_1=6.283185307
[IniGridOy]
periodic=no
segments=1
points_1=12
scales_1=1.0
opts_1=uniform
[IniGridOz]
periodic=yes
segments=1
points_1=9
scales_1=3.141592653
"""



def _setup(nx=32, ny=24, nz=16):
    grid = uniform_grid(nx, ny, nz, 2 * np.pi, 1.0, np.pi)
    fdm = build_fdm_plan(grid)
    nsp = NSParams(reynolds=100.0, schmidt=(1.0,))
    bcs = dyn.WallBCs.from_velocity_kind("freeslip", "freeslip",
                                         scalar_bcs=(("neumann", "neumann"),))
    P = dyn.build_device_plans(fdm, nsp, bcs, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    st = State(u=jnp.asarray(rng.standard_normal((nx, ny, nz))),
               v=jnp.asarray(rng.standard_normal((nx, ny, nz))),
               w=jnp.asarray(rng.standard_normal((nx, ny, nz))),
               s=jnp.asarray(rng.standard_normal((1, nx, ny, nz))))
    return grid, nsp, P, st


def test_flow_statistics_basic():
    grid, nsp, P, st = _setup()
    out = averages.flow_statistics(P, st, nsp.visc)
    U = np.asarray(out["rU"])
    assert np.allclose(U, np.asarray(st.u).mean(axis=(0, 2)), atol=1e-12)
    assert np.all(np.asarray(out["Tke"]) > 0)
    assert np.all(np.asarray(out["Eps"]) > 0)
    # gaussian noise: skewness ~ 0, flatness ~ 3
    assert np.max(np.abs(np.asarray(out["SU"]))) < 0.5
    assert np.max(np.abs(np.asarray(out["FU"]) - 3.0)) < 1.0


def test_scalar_statistics_basic():
    grid, nsp, P, st = _setup()
    out = averages.scalar_statistics(P, st, nsp.diffusivity(0), 0)
    assert np.allclose(np.asarray(out["rS"]),
                       np.asarray(st.s[0]).mean(axis=(0, 2)), atol=1e-12)
    assert np.all(np.asarray(out["Chi"]) > 0)


def test_spectrum_parseval():
    grid, nsp, P, st = _setup()
    e = np.asarray(spectra.spectrum_x(st.u))
    var = np.asarray(jnp.mean(st.u ** 2, axis=(0, 2)))
    assert np.allclose(e.sum(axis=0), var, rtol=1e-10)
    ez = np.asarray(spectra.spectrum_z(st.u))
    assert np.allclose(ez.sum(axis=0), var, rtol=1e-10)


def test_pdf_counts():
    grid, nsp, P, st = _setup()
    counts, edges = pdfs.pdf_per_plane(st.u, nbins=32)
    counts = np.asarray(counts)
    nx, ny, nz = st.u.shape
    assert counts.shape == (ny, 32)
    assert np.allclose(counts.sum(axis=1), nx * nz)


def test_table_roundtrip(tmp_path):
    grid, nsp, P, st = _setup()
    out = averages.flow_statistics(P, st, nsp.visc)
    path = str(tmp_path / "avg10")
    averages.write_table(path, grid.y.nodes, out, 10, 0.5)
    back = averages.read_table(path)
    assert np.allclose(back["Tke"], np.asarray(out["Tke"]), atol=1e-7)


def test_conditional_statistics():
    grid, nsp, P, st = _setup()
    gate = (st.u > 0).astype(st.u.dtype)
    cavg, gamma = averages.conditional_average(st.u, gate)
    # conditioned on u>0, the mean must be positive everywhere
    assert np.all(np.asarray(cavg) > 0)
    assert np.all((np.asarray(gamma) > 0.2) & (np.asarray(gamma) < 0.8))
    out = averages.conditional_flow_statistics(P, st, gate)
    assert np.all(np.asarray(out["cU"]) > 0)
    assert np.all(np.asarray(out["cU2"]) > 0)


def test_apriori_subgrid():
    from tlab_tpu.ops.filter import FilterSpec, build_filter_matrices
    from tlab_tpu.tools.apriori import apriori_statistics
    from tlab_tpu.fdm.plan import build_fdm_plan
    from tlab_tpu.grid import uniform_grid
    grid = uniform_grid(32, 24, 16, 2 * np.pi, 1.0, np.pi)
    fdm = build_fdm_plan(grid)
    nsp = NSParams(reynolds=100.0, schmidt=())
    bcs = dyn.WallBCs.from_velocity_kind("freeslip", "freeslip", scalar_bcs=())
    P = dyn.build_device_plans(fdm, nsp, bcs, dtype=jnp.float64,
                               with_elliptic=False)
    rng = np.random.default_rng(3)
    st = State(u=jnp.asarray(rng.standard_normal(grid.shape)),
               v=jnp.asarray(rng.standard_normal(grid.shape)),
               w=jnp.asarray(rng.standard_normal(grid.shape)),
               s=jnp.zeros((0,) + grid.shape))
    mats = build_filter_matrices(
        fdm, FilterSpec(type="tophat", parameters=(4,)), jnp.float64)
    out = apriori_statistics(P, mats, st, delta=4 * 2 * np.pi / 32)
    assert np.all(np.asarray(out["Ksgs"]) > 0)        # positive subgrid TKE
    assert np.isfinite(np.asarray(out["Cs2"])).all()


def test_cloud_mixing_diagram():
    from tlab_tpu.physics import thermo
    from tlab_tpu.tools.cloudstate import mixing_diagram
    tp = thermo.ThermoParams(mixture="airwater")
    # cloudy parcel (cool, moist) mixing with warm dry air above
    d = mixing_diagram(tp, h1=0.96, qt1=0.012, h2=1.01, qt2=0.002, p=1.0)
    assert d["ql"][0] > 0.0                   # cloudy end is saturated
    assert d["ql"][-1] == 0.0                 # environment is clear
    # liquid decreases monotonically-ish toward the clear end
    assert d["ql"][0] == max(d["ql"])


def test_cross_spectra_and_2d():
    """Cross-spectrum of two phase-shifted sinusoids: power concentrated in
    the forced mode, phase equals the shift; 2-D spectrum localizes the
    (kx,kz) forcing; Parseval holds for the y-blocked 2-D PSD."""
    from tlab_tpu.stats import spectra
    nx, ny, nz = 32, 5, 16
    x = np.arange(nx) * 2 * np.pi / nx
    z = np.arange(nz) * 2 * np.pi / nz
    phi = 0.7
    a = np.cos(3 * x)[:, None, None] * np.ones((1, ny, nz))
    b = np.cos(3 * x - phi)[:, None, None] * np.ones((1, ny, nz))
    power, phase = spectra.cross_phase_x(jnp.asarray(a), jnp.asarray(b))
    k = int(np.argmax(np.asarray(power)[:, 0]))
    assert k == 3
    assert abs(float(phase[3, 0]) - phi) < 1e-6

    c = (np.cos(3 * x)[:, None, None]
         * np.cos(2 * z)[None, None, :] * np.ones((1, ny, 1)))
    e2 = np.asarray(spectra.spectrum_2d(jnp.asarray(c), y_blocks=1))[..., 0]
    i, j = np.unravel_index(np.argmax(e2), e2.shape)
    assert (i, abs(j if j <= nz // 2 else j - nz)) == (3, 2)
    # Parseval: sum of PSD = plane variance (mean removed by k=0 carry)
    var = np.mean(c[:, 0, :] ** 2)
    assert abs(e2.sum() - var) < 1e-12

    cz = np.asarray(spectra.correlation_z(jnp.asarray(c)))
    # correlation at zero shift = variance, periodic in z with period pi
    assert abs(cz[0, 0] - var) < 1e-12
    assert abs(cz[nz // 2, 0] - var) < 1e-12     # cos(2z): period nz/2


def test_conditional_averages_tool(tmp_path):
    """Gated averages via the offline tool: a two-layer field gated by the
    scalar recovers the per-layer means and the intermittency profile."""
    import os
    from tlab_tpu.tools import postprocess as pp
    from tlab_tpu.io import fields_io
    from tlab_tpu.stats.averages import read_table

    ini = Ini(text=MINI_CASE)
    sim = Simulation.from_case(load_case(ini))
    nx, ny, nz = sim.grid.shape
    rng = np.random.default_rng(3)
    u = rng.standard_normal((nx, ny, nz))
    s = (u > 0).astype(float)            # gate: exactly where u > 0
    st = State(u=jnp.asarray(u), v=jnp.zeros((nx, ny, nz)),
               w=jnp.zeros((nx, ny, nz)), s=jnp.asarray(s)[None])
    fields_io.write_state(os.path.join(tmp_path, "flow"),
                          os.path.join(tmp_path, "scal"), 5, st, 0.0, 1e-3)
    pp.run_averages(sim, str(tmp_path), [5], gate_scalar=1, gate_level=0.5)
    cond = read_table(os.path.join(tmp_path, "cavg5"))
    gam = read_table(os.path.join(tmp_path, "int5"))
    # gated mean of u must be positive everywhere; ungated mean ~ 0
    assert np.all(cond["cU"] > 0.2)
    assert np.all((gam["gamma"] > 0.3) & (gam["gamma"] < 0.7))


def test_visuals_extended(tmp_path):
    """Extended visuals quantities write finite single-precision fields."""
    import os
    from tlab_tpu.tools import postprocess as pp
    from tlab_tpu.io import fields_io

    sim = Simulation.from_case(load_case(Ini(text=MINI_CASE)))
    nx, ny, nz = sim.grid.shape
    rng = np.random.default_rng(5)
    st = State(u=jnp.asarray(rng.standard_normal((nx, ny, nz))),
               v=jnp.asarray(rng.standard_normal((nx, ny, nz))),
               w=jnp.asarray(rng.standard_normal((nx, ny, nz))),
               s=jnp.asarray(rng.standard_normal((1, nx, ny, nz))))
    fields_io.write_state(os.path.join(tmp_path, "flow"),
                          os.path.join(tmp_path, "scal"), 3, st, 0.0, 1e-3)
    pp.run_visuals(sim, str(tmp_path), [3],
                   which=("VelocityMagnitude", "Pressure",
                          "HorizontalDivergence", "LogEnstrophy",
                          "ScalarGradientVector"))
    for tag in ("VelocityMagnitude", "Pressure", "HorizontalDivergence",
                "LogEnstrophy", "Gx", "Gy", "Gz"):
        a = fields_io.read_visual(os.path.join(tmp_path, f"vis3.{tag}"),
                                  sim.grid.shape)
        assert np.isfinite(a).all(), tag


def test_visuals_vector_tensor_family(tmp_path):
    """VelocityVector/VorticityVector/StrainTensor component files
    (visuals.f90:495-498,725-727,776-779), LogPotentialEnstrophy, and
    the IBM EpsSolid mask visual."""
    import os
    from tlab_tpu.tools import postprocess as pp
    from tlab_tpu.io import fields_io
    from tlab_tpu import ibm as ibmmod

    ini = Ini(text=MINI_CASE + """
[BodyForce]
Type=homogeneous
Vector=0.0,-1.0,0.0
Parameters=1.0
""")
    sim = Simulation.from_case(load_case(ini))
    nx, ny, nz = sim.grid.shape
    rng = np.random.default_rng(7)
    st = State(u=jnp.asarray(rng.standard_normal((nx, ny, nz))),
               v=jnp.asarray(rng.standard_normal((nx, ny, nz))),
               w=jnp.asarray(rng.standard_normal((nx, ny, nz))),
               s=jnp.asarray(rng.standard_normal((1, nx, ny, nz))))
    fields_io.write_state(os.path.join(tmp_path, "flow"),
                          os.path.join(tmp_path, "scal"), 4, st, 0.0, 1e-3)
    eps = np.zeros((nx, ny, nz))
    eps[:, :2, :] = 1.0
    sim.P["ibm"] = ibmmod.build_ibm(eps, dtype=st.u.dtype)
    pp.run_visuals(sim, str(tmp_path), [4],
                   which=("VelocityVector", "VorticityVector",
                          "StrainTensor", "LogPotentialEnstrophy",
                          "EpsSolid"))
    shape = sim.grid.shape
    # component naming + content
    vv1 = fields_io.read_visual(
        os.path.join(tmp_path, "vis4.VelocityVector1"), shape)
    np.testing.assert_allclose(vv1, np.asarray(st.u, np.float32),
                               rtol=1e-6)
    # VorticityVector1 = dw/dy - dv/dz
    w1 = fields_io.read_visual(
        os.path.join(tmp_path, "vis4.VorticityVector1"), shape)
    ref = np.asarray(dyn._d1(sim.P, "y", 1, st.w)
                     - dyn._d1(sim.P, "z", 2, st.v))
    np.testing.assert_allclose(w1, ref, rtol=2e-5, atol=1e-5)
    # StrainTensor order Sxx..Syz (fi_strain.f90): S1 = du/dx,
    # S4 = 0.5(du/dy + dv/dx)
    s1 = fields_io.read_visual(
        os.path.join(tmp_path, "vis4.StrainTensor1"), shape)
    np.testing.assert_allclose(
        s1, np.asarray(dyn._d1(sim.P, "x", 0, st.u)), rtol=2e-5,
        atol=1e-5)
    s4 = fields_io.read_visual(
        os.path.join(tmp_path, "vis4.StrainTensor4"), shape)
    ref4 = 0.5 * np.asarray(dyn._d1(sim.P, "y", 1, st.u)
                            + dyn._d1(sim.P, "x", 0, st.v))
    np.testing.assert_allclose(s4, ref4, rtol=2e-5, atol=1e-5)
    for i in (2, 3, 5, 6):
        a = fields_io.read_visual(
            os.path.join(tmp_path, f"vis4.StrainTensor{i}"), shape)
        assert np.isfinite(a).all(), i
    lpe = fields_io.read_visual(
        os.path.join(tmp_path, "vis4.LogPotentialEnstrophy"), shape)
    assert np.isfinite(lpe).all()
    es = fields_io.read_visual(os.path.join(tmp_path, "vis4.EpsSolid"),
                               shape)
    np.testing.assert_allclose(es, eps.astype(np.float32))


def test_visuals_supsat(tmp_path):
    """Supsat visual: actual-minus-equilibrium liquid normalized by the
    first liquid value (visuals.f90:527-533)."""
    import os
    from tlab_tpu.tools import postprocess as pp
    from tlab_tpu.io import fields_io
    from tlab_tpu import runtime as rt
    from tlab_tpu.physics import thermo as th

    ini = Ini(text="""
[Main]
Type=temporal
Equations=anelastic
SpaceOrder=CompactJacobian6
TimeOrder=RungeKuttaExplicit3
[Parameters]
Reynolds=100
Schmidt=1.0,1.0,1.0
Damkohler=1.0,1.0,1.0
[Control]
ScalLimit=no
[Thermodynamics]
Mixture=airwater
ScaleHeight=20.0
[Scalar]
ProfileScalar1=Linear
DeltaScalar1=0.0
MeanScalar1=1.0
ProfileScalar2=None
MeanScalar2=0.005
ProfileScalar3=None
MeanScalar3=0.0
[IniGridOx]
periodic=yes
segments=1
points_1=17
scales_1=6.283185307
[IniGridOy]
periodic=no
segments=1
points_1=12
scales_1=1.0
opts_1=uniform
[IniGridOz]
periodic=yes
segments=1
points_1=9
scales_1=3.141592653
""")
    sim = Simulation.from_case(load_case(ini))
    nx, ny, nz = sim.grid.shape
    rng = np.random.default_rng(11)
    h = 0.995 + 0.005 * rng.random((nx, ny, nz))
    qt = 0.01 + 0.002 * rng.random((nx, ny, nz))
    ql = 1e-4 + 1e-4 * rng.random((nx, ny, nz))
    st = State(u=jnp.zeros((nx, ny, nz)), v=jnp.zeros((nx, ny, nz)),
               w=jnp.zeros((nx, ny, nz)),
               s=jnp.asarray(np.stack([h, qt, ql])))
    fields_io.write_state(os.path.join(tmp_path, "flow"),
                          os.path.join(tmp_path, "scal"), 2, st, 0.0, 1e-3)
    pp.run_visuals(sim, str(tmp_path), [2], which=("Supsat",))
    got = fields_io.read_visual(os.path.join(tmp_path, "vis2.Supsat"),
                                sim.grid.shape)
    ane = rt.make_anelastic(sim.case, sim.grid, sim.dtype)
    ql_eq = np.asarray(th.diagnostic_fields(ane["tp"],
                                            jnp.asarray(np.stack([h, qt])),
                                            ane["bg"])["ql"])
    want = (ql - ql_eq) / ql.reshape(-1)[0]
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-4,
                               atol=1e-6)


AIRWATER_INI = """
[Main]
Type=temporal
Equations=anelastic
SpaceOrder=CompactJacobian6
TimeOrder=RungeKuttaExplicit3
[Parameters]
Reynolds=100
Schmidt=1.0,1.0,1.0
Damkohler=1.0,1.0,1.0
[Control]
ScalLimit=no
[Thermodynamics]
Mixture=airwater
ScaleHeight=20.0
[Scalar]
ProfileScalar1=Linear
DeltaScalar1=0.0
MeanScalar1=1.0
ProfileScalar2=None
MeanScalar2=0.005
ProfileScalar3=None
MeanScalar3=0.0
[IniGridOx]
periodic=yes
segments=1
points_1=17
scales_1=6.283185307
[IniGridOy]
periodic=no
segments=1
points_1=12
scales_1=1.0
opts_1=uniform
[IniGridOz]
periodic=yes
segments=1
points_1=9
scales_1=3.141592653
"""


def _airwater_state(sim, seed=11):
    nx, ny, nz = sim.grid.shape
    rng = np.random.default_rng(seed)
    h = 0.995 + 0.005 * rng.random((nx, ny, nz))
    qt = 0.01 + 0.002 * rng.random((nx, ny, nz))
    ql = 1e-4 + 1e-4 * rng.random((nx, ny, nz))
    return State(u=jnp.zeros((nx, ny, nz)), v=jnp.zeros((nx, ny, nz)),
                 w=jnp.zeros((nx, ny, nz)),
                 s=jnp.asarray(np.stack([h, qt, ql])))


def test_species_visuals_and_mixture_menu_shift(tmp_path):
    """Airwater species visuals H2Ov/Air/H2Ol (visuals.f90:649-668) and
    the mixture iscal_offset shift: with NSP=3 the menu offset is 12, so
    ParamVisuals=16 selects VorticityVector (iscal_offset+4), NOT
    StrainTensor as in the single-species menu."""
    import os
    import subprocess
    import sys
    from tlab_tpu.io import fields_io

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = AIRWATER_INI + ("\n[PostProcessing]\nFiles=2\n"
                          "ParamVisuals=10,11,12,16\n")
    ini = str(tmp_path / "tlab.ini")
    open(ini, "w").write(src)
    sim = Simulation.from_case(load_case(Ini(text=src)))
    st = _airwater_state(sim)
    fields_io.write_state(os.path.join(tmp_path, "flow"),
                          os.path.join(tmp_path, "scal"), 2, st, 0.0, 1e-3)
    r = subprocess.run(
        [sys.executable, "-m", "tlab_tpu.tools.cli", "visuals", "--cpu",
         "--x64", "--ini", ini, "--outdir", str(tmp_path)],
        cwd=REPO, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-1500:]
    shp = sim.grid.shape
    qt, ql = np.asarray(st.s[1]), np.asarray(st.s[2])
    v = fields_io.read_visual(os.path.join(tmp_path, "vis2.H2Ov"), shp)
    np.testing.assert_allclose(v, (qt - ql).astype(np.float32), rtol=1e-5)
    a = fields_io.read_visual(os.path.join(tmp_path, "vis2.Air"), shp)
    np.testing.assert_allclose(a, (1.0 - qt).astype(np.float32),
                               rtol=1e-5)
    l = fields_io.read_visual(os.path.join(tmp_path, "vis2.H2Ol"), shp)
    np.testing.assert_allclose(l, ql.astype(np.float32), rtol=1e-5)
    # menu 16 = iscal_offset+4 = VorticityVector for this mixture
    assert os.path.exists(os.path.join(tmp_path,
                                       "vis2.VorticityVector1"))
    assert not os.path.exists(os.path.join(tmp_path,
                                           "vis2.StrainTensor1"))


def test_phase_average():
    """Phase-locked averaging: a field oscillating with period 4 steps is
    recovered per phase slot with the cycle-mean removed correctly."""
    from tlab_tpu.stats.phaseavg import PhaseAverage
    nx, ny, nz = 6, 5, 8
    pa = PhaseAverage.create(stride=1, restart=4, nx=nx, ny=ny,
                             n_scalars=0, with_pressure=False)
    rng = np.random.default_rng(0)
    base = rng.standard_normal((4, nx, ny))       # per-phase signal
    for it in range(1, 25):
        ph = it % 4
        u = base[ph][:, :, None] + 0.01 * rng.standard_normal((nx, ny, nz))
        fields = {"u": jnp.asarray(np.broadcast_to(u, (nx, ny, nz)).copy()),
                  "v": jnp.zeros((nx, ny, nz)),
                  "w": jnp.zeros((nx, ny, nz))}
        pa.accumulate(it, fields)
    for slot in range(4):
        got = pa.mean("u", slot)
        ph = slot % 4
        assert np.max(np.abs(got - base[ph])) < 0.02, slot
    # stress of a zero field is ~0
    assert np.max(np.abs(pa.stress("v", "w", 0))) < 1e-12


def test_tke_budget_closure():
    """The plane-averaged TKE budget terms approximately close for a
    statistically generated field: Prod - Eps + Trp + PresTrp + ViscTrp
    integrates over y to Prod - Eps (transport terms integrate to ~0 for
    fields vanishing at walls)."""
    from tlab_tpu.dycore.incompressible import WallBCs, build_device_plans
    from tlab_tpu.fdm.plan import build_fdm_plan
    from tlab_tpu.grid import uniform_grid
    from tlab_tpu.physics.params import NSParams

    grid = uniform_grid(32, 49, 16, 2 * np.pi, 1.0, np.pi)
    fdm = build_fdm_plan(grid)
    nsp = NSParams(reynolds=100.0, schmidt=())
    P = build_device_plans(fdm, nsp, WallBCs(s=()), dtype=jnp.float64)
    nx, ny, nz = grid.shape
    rng = np.random.default_rng(0)
    y = grid.y.nodes
    env = (np.sin(np.pi * y) ** 2)[None, :, None]
    st = State(u=jnp.asarray(env * rng.standard_normal((nx, ny, nz))),
               v=jnp.asarray(env * rng.standard_normal((nx, ny, nz))),
               w=jnp.asarray(env * rng.standard_normal((nx, ny, nz))),
               s=jnp.zeros((0, nx, ny, nz)))
    out = averages.flow_statistics(P, st, nsp.visc)
    for key in ("Pxx", "Exx", "PIxx", "Trp2", "Trp3", "Exy", "Tke_t",
                "Txxy_y", "Phi", "UgradP", "U_y2", "rU3"):
        assert key in out and np.isfinite(np.asarray(out[key])).all(), key
    # transport terms integrate to ~0 over the channel (flux form,
    # envelope vanishes at walls)
    w_int = np.trapezoid(np.asarray(out["Trp"]), y)
    scale = np.trapezoid(np.abs(np.asarray(out["Eps"])), y)
    assert abs(w_int) < 0.05 * scale
    # trace of pressure-strain is ~0 (incompressibility) -- here the field
    # is NOT solenoidal, so only check finiteness of the trace
    tr = np.asarray(out["PIxx"] + out["PIyy"] + out["PIzz"])
    assert np.isfinite(tr).all()


def test_rij_budget_closure():
    """Complete R_ij budget (reference AVG_FLOW_XZ budget groups): the
    tendency-projected derivative <u'_i h'_j + u'_j h'_i> equals
    P + T + PI + G + D - E + C per component to discretization error,
    with the SAME pressure the projection used (no re-solve)."""
    import jax.numpy as jnp
    from tlab_tpu.dycore import incompressible as dyn
    from tlab_tpu.dycore.state import State
    from tlab_tpu.fdm.plan import build_fdm_plan
    from tlab_tpu.grid import uniform_grid
    from tlab_tpu.physics.params import NSParams
    from tlab_tpu.stats import averages as avg

    nx, ny, nz = 32, 96, 16
    grid = uniform_grid(nx, ny, nz, 2.0 * np.pi, 1.0, np.pi)
    fdm = build_fdm_plan(grid)
    P = dyn.build_device_plans(
        fdm, NSParams(reynolds=500.0, schmidt=(1.0,)),
        dyn.WallBCs.from_velocity_kind("freeslip", "freeslip",
                                       scalar_bcs=(("neumann", "neumann"),)),
        dtype=jnp.float64)

    # smooth 3-D solenoidal-ish field with mean shear
    X = grid.x.nodes[:, None, None] * np.ones(grid.shape)
    Y = grid.y.nodes[None, :, None] * np.ones(grid.shape)
    Z = grid.z.nodes[None, None, :] * np.ones(grid.shape)
    env = np.sin(np.pi * Y) ** 2
    u = np.tanh((Y - 0.5) / 0.15) + 0.1 * env * np.sin(2 * X) * np.cos(2 * Z)
    v = 0.1 * env * np.cos(2 * X) * np.sin(2 * Z)
    w = 0.1 * env * np.sin(2 * X + 1.0) * np.cos(4 * Z)
    st = State(u=jnp.asarray(u), v=jnp.asarray(v), w=jnp.asarray(w),
               s=jnp.zeros((1,) + grid.shape))
    # project once so the state is solenoidal, then evaluate the tendency
    st, _ = dyn.rk_step(P, st, 1e-6)
    z = jnp.zeros_like(st.u)
    (h1, h2, h3), hs, p = dyn.substep_rhs(P, st, (z, z, z),
                                          jnp.zeros_like(st.s), 1.0)

    visc = P["visc"]
    out = avg.flow_statistics(P, st, visc, p=p)

    def pavg(a):
        return np.asarray(jnp.mean(a, axis=(0, 2)))

    fl = {"x": st.u - jnp.mean(st.u, axis=(0, 2))[None, :, None],
          "y": st.v - jnp.mean(st.v, axis=(0, 2))[None, :, None],
          "z": st.w - jnp.mean(st.w, axis=(0, 2))[None, :, None]}
    hf = {"x": h1 - jnp.mean(h1, axis=(0, 2))[None, :, None],
          "y": h2 - jnp.mean(h2, axis=(0, 2))[None, :, None],
          "z": h3 - jnp.mean(h3, axis=(0, 2))[None, :, None]}

    sl = slice(4, ny - 4)                       # skip bc-modified rows
    worst = 0.0
    for tag, i, j in (("xx", "x", "x"), ("yy", "y", "y"), ("zz", "z", "z"),
                      ("xy", "x", "y"), ("xz", "x", "z"), ("yz", "y", "z")):
        dRdt = pavg(fl[i] * hf[j] + fl[j] * hf[i])
        # reference transient term: Rij_t = -Fij + Bij + Cij + Pij - Eij
        #                                   + (PIij - Tijy_y - Gij + Dij)/rR
        rhs = np.asarray(out[f"R{tag}_t"])
        scale = max(np.max(np.abs(dRdt[sl])),
                    np.max(np.abs(out[f"E{tag}"])), 1e-12)
        res = np.max(np.abs(dRdt[sl] - rhs[sl])) / scale
        worst = max(worst, res)
        assert res < 0.05, (tag, res, scale)
    # trace of the pressure-strain tensor vanishes for solenoidal flow
    tr = np.asarray(out["PIxx"] + out["PIyy"] + out["PIzz"])
    assert np.max(np.abs(tr[sl])) < 0.05 * max(
        np.max(np.abs(np.asarray(out["PIxx"]))), 1e-12)


def test_scalar_variance_budget_closure():
    """Scalar-variance budget (reference AVG_SCAL_XZ): 2<s' hs'> equals
    Pss + Tss + Dss - Chi + Css to discretization error."""
    import jax.numpy as jnp
    from tlab_tpu.dycore import incompressible as dyn
    from tlab_tpu.dycore.state import State
    from tlab_tpu.fdm.plan import build_fdm_plan
    from tlab_tpu.grid import uniform_grid
    from tlab_tpu.physics.params import NSParams
    from tlab_tpu.stats import averages as avg

    nx, ny, nz = 32, 96, 16
    grid = uniform_grid(nx, ny, nz, 2.0 * np.pi, 1.0, np.pi)
    fdm = build_fdm_plan(grid)
    P = dyn.build_device_plans(
        fdm, NSParams(reynolds=500.0, schmidt=(1.0,)),
        dyn.WallBCs.from_velocity_kind("freeslip", "freeslip",
                                       scalar_bcs=(("neumann", "neumann"),)),
        dtype=jnp.float64)
    X = grid.x.nodes[:, None, None] * np.ones(grid.shape)
    Y = grid.y.nodes[None, :, None] * np.ones(grid.shape)
    Z = grid.z.nodes[None, None, :] * np.ones(grid.shape)
    env = np.sin(np.pi * Y) ** 2
    u = np.tanh((Y - 0.5) / 0.15) + 0.1 * env * np.sin(2 * X) * np.cos(2 * Z)
    v = 0.1 * env * np.cos(2 * X) * np.sin(2 * Z)
    w = 0.1 * env * np.sin(2 * X + 1.0) * np.cos(4 * Z)
    s = 0.5 - 0.5 * np.tanh((Y - 0.5) / 0.15) \
        + 0.05 * env * np.sin(3 * X) * np.cos(2 * Z)
    st = State(u=jnp.asarray(u), v=jnp.asarray(v), w=jnp.asarray(w),
               s=jnp.asarray(s)[None])
    st, _ = dyn.rk_step(P, st, 1e-6)
    z = jnp.zeros_like(st.u)
    _, hs, _ = dyn.substep_rhs(P, st, (z, z, z), jnp.zeros_like(st.s), 1.0)

    out = avg.scalar_statistics(P, st, P["diff"][0], 0)

    sf = st.s[0] - jnp.mean(st.s[0], axis=(0, 2))[None, :, None]
    hsf = hs[0] - jnp.mean(hs[0], axis=(0, 2))[None, :, None]
    dRdt = np.asarray(jnp.mean(2.0 * sf * hsf, axis=(0, 2)))
    # reference transient term: Rss_t = Css + Pss - Ess + Qss
    #                                   + (Dss - Tssy_y)/rR
    rhs = np.asarray(out["Rss_t"])
    ny_ = dRdt.shape[0]
    sl = slice(4, ny_ - 4)
    scale = max(np.max(np.abs(dRdt[sl])), 1e-12)
    res = np.max(np.abs(dRdt[sl] - rhs[sl])) / scale
    assert res < 0.05, res


def test_full_table_reference_format(tmp_path):
    """The avg<it> file layout matches the reference (io_averages.f90:
    RTIME line, GROUP lines, I J Y header): full column set, roundtrip
    through read_avg, and the anelastic Stratification group is filled."""
    from tlab_tpu.config import load_case, Ini
    from tlab_tpu.runtime import Simulation
    from tests.test_anelastic import INI_TEXT, _background_state

    sim = Simulation.from_case(load_case(Ini(text=INI_TEXT)),
                               dtype=jnp.float64)
    st = _background_state(sim)
    extras = averages.build_extras(sim, st)
    out = averages.flow_statistics(sim.P, st, sim.nsp.visc, extras=extras)

    names = [n for _, vars_ in averages.FLOW_GROUPS for n in vars_.split()]
    assert len(names) == 191
    for n in names:
        assert n in out, n
        assert np.isfinite(np.asarray(out[n])).all(), n
    # anelastic: density/temperature/stratification columns are live
    assert np.all(np.asarray(out["rT"]) > 0)
    assert np.all(np.asarray(out["rR"]) > 0)
    assert np.all(np.asarray(out["PotTemp"]) > 0)
    assert np.all(np.asarray(out["SaturationPressure"]) > 0)
    assert np.all(np.asarray(out["LapseRate_fr"]) > 0)

    path = tmp_path / "avg100"
    averages.write_avg(str(path), sim.grid.y.nodes, out,
                       averages.FLOW_GROUPS, 100, 1.5)
    rtime, groups, back = averages.read_avg(str(path))
    assert rtime == 1.5
    assert [g for g, _ in groups] == [g for g, _ in averages.FLOW_GROUPS]
    assert np.allclose(back["Tke"], np.asarray(out["Tke"]), atol=1e-7)
    assert np.allclose(back["PotTemp"], np.asarray(out["PotTemp"]),
                       rtol=1e-7)

    sgroups = averages.scal_groups(st.s.shape[0])
    sc = averages.scalar_statistics(sim.P, st, sim.nsp.diffusivity(0), 0,
                                    visc=sim.nsp.visc, extras=extras)
    snames = [n for _, vars_ in sgroups for n in vars_.split()]
    assert len(snames) == 6 + 9 + 9 + 13 + 14 + 13 + 9 + 2 * st.s.shape[0]
    for n in snames:
        assert n in sc, n
        assert np.isfinite(np.asarray(sc[n])).all(), n
    averages.write_avg(str(tmp_path / "avg100s1"), sim.grid.y.nodes, sc,
                       sgroups, 100, 1.5)
    _, _, sback = averages.read_avg(str(tmp_path / "avg100s1"))
    assert np.allclose(sback["rS"], np.asarray(sc["rS"]), atol=1e-7)


def test_netcdf_averages_roundtrip(tmp_path):
    """[Main] FileFormat=netcdf writes avg<it>.nc with the reference's
    variable layout (io_averages.f90:64-89: t unlimited + y dims, per-
    column float vars with a group attribute) and reads back."""
    import os
    grid, nsp, P, st = _setup(16, 12, 8)
    out = averages.flow_statistics(P, st, nsp.visc)
    p1 = os.path.join(tmp_path, "avg7")
    averages.write_avg_nc(p1, grid.y.nodes, out, averages.FLOW_GROUPS,
                          7, 0.25)
    rtime, groups, back = averages.read_avg_nc(p1 + ".nc")
    assert abs(rtime - 0.25) < 1e-6
    gmap = dict(groups)
    assert "Mean" in gmap and "rU" in gmap["Mean"].split()
    assert np.allclose(back["rU"], np.asarray(out["rU"]), atol=1e-5)
    assert np.allclose(back["Y"], grid.y.nodes, atol=1e-6)
    # writer dispatch: FileFormat=netcdf selects the .nc writer
    from tlab_tpu.config import load_case, Ini
    case = load_case(Ini(text=MINI_CASE.replace(
        "[Main]", "[Main]\nFileFormat=netcdf")))
    assert averages.avg_writer(case) is averages.write_avg_nc
    case2 = load_case(Ini(text=MINI_CASE))
    assert averages.avg_writer(case2) is averages.write_avg


def test_device_pdf_table_matches_host():
    """stats.pdfs.pdf1v_plane_table_device equals the host
    reference_formats.pdf1v_plane_table (adaptive two-pass, ibc=2) incl.
    a constant plane and near-edge truncation."""
    import jax.numpy as jnp
    from tlab_tpu.io import reference_formats as rf
    from tlab_tpu.stats.pdfs import pdf1v_plane_table_device
    rng = np.random.default_rng(11)
    f = rng.standard_normal((12, 6, 8))
    f[:, 2, :] = 3.25                      # constant plane
    f[:, 3, :] = np.round(f[:, 3, :] * 4) / 4   # many exact bin-edge ties
    got = np.asarray(pdf1v_plane_table_device(jnp.asarray(f), 16))
    ref = rf.pdf1v_plane_table(f, nbins=16, ibc=2)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12)


def test_stats_tables_fn_matches_direct():
    """make_stats_tables_fn (one jitted stacked computation) returns the
    same columns as the eager flow/scalar_statistics path."""
    from tlab_tpu.config import load_case, Ini
    from tlab_tpu.runtime import Simulation
    import tests.test_pdf_modes as tpm
    import jax.numpy as jnp
    sim = Simulation.from_case(load_case(Ini(text=tpm.INI)))
    rng = np.random.default_rng(2)
    shp = sim.grid.shape
    st = State(u=jnp.asarray(rng.standard_normal(shp)) * 0.1,
               v=jnp.asarray(rng.standard_normal(shp)) * 0.1,
               w=jnp.asarray(rng.standard_normal(shp)) * 0.1,
               s=jnp.asarray(rng.standard_normal((1,) + shp)) * 0.1)
    fn = averages.make_stats_tables_fn(sim)
    flow, scals = fn(st)
    ex = averages.build_extras(sim, st)
    ref_flow = averages.flow_statistics(sim.P, st, sim.nsp.visc, extras=ex)
    assert set(flow) == set(ref_flow)
    for k in ref_flow:
        np.testing.assert_allclose(flow[k], np.asarray(ref_flow[k]),
                                   rtol=1e-12, atol=1e-13, err_msg=k)
    ref_s = averages.scalar_statistics(sim.P, st, sim.nsp.diffusivity(0),
                                       0, visc=sim.nsp.visc, extras=ex)
    assert set(scals[0]) == set(ref_s)
    for k in ref_s:
        np.testing.assert_allclose(scals[0][k], np.asarray(ref_s[k]),
                                   rtol=1e-12, atol=1e-13, err_msg=k)
