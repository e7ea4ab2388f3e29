"""Observability subsystems: tracing (TRACE_ON analog), compressible
bounds control (DNS_BOUNDS_CONTROL), profiling, walltime watchdog."""
import os

import numpy as np

from tlab_tpu.config import load_case, Ini
from tlab_tpu.runtime import Simulation
from tlab_tpu.tools import dns as dns_tool
from tlab_tpu.utils import trace

COMP_SMALL = """
[Main]
Type=temporal
Equations=internal
TermAdvection=skewsymmetric
SpaceOrder=CompactJacobian6
TimeOrder=RungeKuttaExplicit4
TimeCFL=1.0
{main_extra}
[Parameters]
Reynolds=1000
Mach=0.6
Prandtl=0.7
Schmidt=1.0
[Iteration]
Start=0
End=4
Restart=0
Statistics=0
IteraLog=1
{iter_extra}
[Control]
FlowLimit={flow_limit}
ScalLimit=no
{control_extra}
[Grid]
XPeriodic=yes
YPeriodic=no
ZPeriodic=yes
[Flow]
ProfileVelocityX=Tanh
ThickVelocityX=0.05
DeltaVelocityX=1.0
Pressure=1.984127
ProfilePressure=Linear
Density=1.0
ProfileDensity=Linear
[Scalar]
ProfileScalar1=Tanh
ThickScalar1=0.05
DeltaScalar1=-1.0
MeanScalar1=0.5
[BoundaryConditions]
[IniFields]
Velocity=None
[IniGridOx]
periodic=yes
segments=1
points_1=33
scales_1=2.0
opts_1=uniform
[IniGridOy]
periodic=no
segments=1
points_1=32
scales_1=1.0
opts_1=uniform
[IniGridOz]
periodic=no
segments=1
points_1=1
scales_1=1.0
opts_1=uniform
"""


def _mk(tmp_path, flow_limit="no", control_extra="", main_extra="",
        iter_extra=""):
    ini = Ini(text=COMP_SMALL.format(flow_limit=flow_limit,
                                     control_extra=control_extra,
                                     main_extra=main_extra,
                                     iter_extra=iter_extra))
    sim = Simulation.from_case(load_case(ini))
    from tlab_tpu.tools.initialize import compressible_initial_state
    U = compressible_initial_state(sim, seed=3)
    return sim, U


def test_trace_file_written(tmp_path):
    """[Main] Tracing=yes writes tlab.trace with ENTERING/LEAVING phase
    lines and per-iteration points (reference TRACE_ON tfile analog)."""
    out = str(tmp_path)
    sim, U = _mk(tmp_path, main_extra="Tracing=yes")
    try:
        dns_tool.run(sim, U, outdir=out, n_steps=2)
    finally:
        trace.close()
    path = os.path.join(out, "tlab.trace")
    assert os.path.exists(path)
    txt = open(path).read()
    assert "ENTERING building step functions (jit)" in txt
    assert "LEAVING" in txt
    assert "iteration 2 logged" in txt


def test_bounds_control_aborts_and_checkpoints(tmp_path):
    """FlowLimit=yes with a violated MaxPressure bound stops the run with
    status 2, writes tlab.err, and the log keeps the offending extrema
    (DNS_BOUNDS_CONTROL, dns_local.f90:136-158)."""
    out = str(tmp_path)
    sim, U = _mk(tmp_path, flow_limit="yes",
                 control_extra="MaxPressure=1.9\nMinPressure=0.1")
    run = dns_tool.run(sim, U, outdir=out, n_steps=4)
    # aborted on the first logged step
    last = run.log.lines[-1]
    assert last.startswith("2 ")
    err = open(os.path.join(out, "tlab.err")).read()
    assert "out of bounds" in err


def test_bounds_control_defaults_pass(tmp_path):
    """Default bounds (pbg 1e-/+6) never trip a healthy run."""
    out = str(tmp_path)
    sim, U = _mk(tmp_path, flow_limit="yes")
    run = dns_tool.run(sim, U, outdir=out, n_steps=4)
    assert run.log.lines[-1].startswith("0 ")
    assert not os.path.exists(os.path.join(out, "tlab.err"))


def test_compressible_postprocessing(tmp_path):
    """The offline tools consume COMPRESSIBLE restarts (reference
    averages.x/visuals.x/pdfs.x work on both solver families): primitive
    conversion + EOS thermodynamic visuals."""
    out = str(tmp_path)
    sim, U = _mk(tmp_path, iter_extra="Restart=2")
    dns_tool.run(sim, U, outdir=out, n_steps=2)
    from tlab_tpu.tools import postprocess as pp
    pp.run_visuals(sim, out, [2],
                   which=("Density", "Temperature", "Pressure",
                          "Enstrophy"))
    pp.run_averages(sim, out, [2])
    pp.run_pdfs(sim, out, [2])
    from tlab_tpu.io import fields_io
    T = fields_io.read_visual(os.path.join(out, "vis2.Temperature"),
                              sim.grid.shape)
    assert T.shape == sim.grid.shape
    assert 0.5 < T.mean() < 2.0
    p = fields_io.read_visual(os.path.join(out, "vis2.Pressure"),
                              sim.grid.shape)
    # p ~ rho T/(gamma M^2) = 1.984 for the uniform base state
    assert abs(p.mean() - 1.984127) < 0.05
    assert os.path.exists(os.path.join(out, "avg2"))


def test_compressible_planes_and_towers(tmp_path):
    """SavePlanes/SaveTowers work in compressible runs via the primitive
    view (reference planes.f90/dns_tower.f90 are solver-agnostic)."""
    out = str(tmp_path)
    sim, U = _mk(tmp_path, iter_extra="SavePlanes=2\nRestart=4",
                 main_extra="""
[SavePlanes]
PlanesJ=5
[SaveTowers]
Stride=8,1,1
Pressure=yes
""")
    dns_tool.run(sim, U, outdir=out, n_steps=4)
    names = os.listdir(out)
    assert any(n.startswith("planesJ") for n in names), names
    assert any(n.startswith("tower") for n in names), names


INC_SMALL = """
[Main]
Type=temporal
Equations=incompressible
SpaceOrder=CompactJacobian6
TimeOrder=RungeKuttaExplicit4
TimeCFL=1.0
[Parameters]
Reynolds=500
Schmidt=1.0
[Iteration]
Start=0
End=4
Restart=0
IteraLog=1
{iter_extra}
[Control]
ScalLimit=no
{control_extra}
[Grid]
XPeriodic=yes
YPeriodic=no
ZPeriodic=yes
{extra}
[Flow]
ProfileVelocityX=Tanh
ThickVelocityX=0.05
DeltaVelocityX=1.0
[Scalar]
ProfileScalar1=Tanh
ThickScalar1=0.05
DeltaScalar1=1.0
[BoundaryConditions]
VelocityJmin=freeslip
VelocityJmax=freeslip
Scalar1Jmin=neumann
Scalar1Jmax=neumann
[IniFields]
Velocity=None
[IniGridOx]
periodic=yes
segments=1
points_1=33
scales_1=2.0
opts_1=uniform
[IniGridOy]
periodic=no
segments=1
points_1=32
scales_1=1.0
opts_1=uniform
[IniGridOz]
periodic=no
segments=1
points_1=1
scales_1=1.0
opts_1=uniform
"""


def _mk_inc(tmp_path, control_extra="", extra="", iter_extra=""):
    from tlab_tpu.tools.initialize import initial_state
    ini = Ini(text=INC_SMALL.format(control_extra=control_extra,
                                    extra=extra, iter_extra=iter_extra))
    sim = Simulation.from_case(load_case(ini))
    return sim, initial_state(sim, seed=5)


def test_max_dilatation_bound(tmp_path):
    """[Control] MaxDilatation trips the bound_d abort (status 3 +
    tlab.err) when the divergence residual exceeds it."""
    out = str(tmp_path)
    sim, st = _mk_inc(tmp_path, control_extra="MaxDilatation=1e-30")
    run = dns_tool.run(sim, st, outdir=out, n_steps=4)
    assert run.log.lines[-1].startswith("3 ")
    assert "Dilatation" in open(os.path.join(out, "tlab.err")).read()


def test_pressure_planes(tmp_path):
    """[SavePlanes] plane sets carry the projection pressure alongside
    the field planes (planes.f90 PLANES_INITIALIZE sizes every set as
    flow + scalars + pressure)."""
    import numpy as np
    out = str(tmp_path)
    sim, st = _mk_inc(tmp_path, iter_extra="SavePlanes=2",
                      extra="[SavePlanes]\nPlanesJ=7\nPressureJ=yes\n")
    dns_tool.run(sim, st, outdir=out, n_steps=4)
    files = [n for n in os.listdir(out) if n.startswith("planesJ.")]
    assert files, os.listdir(out)
    # reference layout: [u v w s1 p] x 1 plane, pressure = last var block
    from tlab_tpu.io.reference_formats import read_planes_file
    a = read_planes_file(os.path.join(out, sorted(files)[0]), "j",
                         (32, 48, 1), nvars=5, nplanes=1)
    assert a.shape == (5, 1, 32, 1)
    assert np.isfinite(a[4]).all()


def test_viscchange_ramp(tmp_path):
    """[ViscChange] Time ramps the viscosity of a restart whose stored
    visc differs from the INI's toward the INI value (dns_main.f90:
    176-184,261): the logged visc column starts at the restart value and
    reaches 1/Re by the end of the ramp."""
    out = str(tmp_path)
    sim, st = _mk_inc(tmp_path, extra="[ViscChange]\nTime=0.01\n")
    visc_ini = sim.nsp.visc                  # 1/500
    run = dns_tool.run(sim, st, outdir=out, n_steps=8,
                       restart_visc=2.0 * visc_ini)
    rows = [ln.split() for ln in run.log.lines if ln.startswith("0 ")]
    viscs = [float(r[6]) for r in rows]
    assert abs(viscs[0] - 2.0 * visc_ini) < 1e-9      # starts at restart
    assert abs(viscs[-1] - visc_ini) < 1e-9           # ramp complete
    assert viscs[0] > viscs[2] > viscs[-1] - 1e-12    # monotone down


def test_profiling_and_watchdog(tmp_path):
    """[Main] Profiling writes dns.prof; [Iteration] Runtime=0 trips the
    walltime watchdog immediately (tlab.err, dns_main.f90:355-360)."""
    out = str(tmp_path)
    sim, U = _mk(tmp_path, main_extra="Profiling=yes",
                 iter_extra="Runtime=0.0")
    dns_tool.run(sim, U, outdir=out, n_steps=4)
    err = open(os.path.join(out, "tlab.err")).read()
    assert "walltime" in err.lower()


def test_apriori_tool_modes(tmp_path):
    """apriori.x equivalent: ParamStructure=1 writes the subgrid-stress
    table sgs<it> (Ksgs/EpsSgs/Cs2), ParamStructure=2 the filtered
    velocity-gradient table gradU<it> (apriori.f90:156-340), both from
    restart files through the CLI menu path."""
    from tlab_tpu.stats import averages as avg
    from tlab_tpu.tools import postprocess as pp
    out = str(tmp_path)
    sim, st = _mk_inc(tmp_path, iter_extra="Restart=2")
    dns_tool.run(sim, st, outdir=out, n_steps=2)
    pp.run_apriori(sim, out, [2])              # default mode 1
    # reference tau<it> table (apriori.f90 AVG_N_XZ tags)
    ttab = avg.read_table(os.path.join(out, "tau2"))
    assert {"Tauxx", "Tauyy", "Tauzz", "Tauxy", "Tauxz", "Tauyz"} <= set(ttab)
    assert np.all(np.isfinite(ttab["Tauxy"]))
    tab = avg.read_table(os.path.join(out, "sgs2"))
    assert {"Ksgs", "EpsSgs", "Cs2"} <= set(tab)
    # compact-cutoff test filter is not positive-definite, so Ksgs may
    # carry round-off-scale negatives; require finite + bounded only
    assert np.all(np.isfinite(tab["Ksgs"]))
    assert np.max(np.abs(tab["Ksgs"])) < 1.0

    sim2 = Simulation.from_case(load_case(Ini(text=INC_SMALL.format(
        control_extra="", iter_extra="",
        extra="[PostProcessing]\nParamStructure=2\n"))))
    pp.run_apriori(sim2, out, [2])
    tab2 = avg.read_table(os.path.join(out, "gradU2"))
    assert "Ux" in tab2 and "Wz2" in tab2
    assert np.all(np.isfinite(tab2["Uy"]))
    # filtered-gradient variance is non-negative by construction
    assert np.all(tab2["Uy2"] >= -1e-12)


def test_nc_converters(tmp_path):
    """planes2nc/tower2nc/stats2nc (the reference's Planes2nc.py,
    tower2nc.py, stats2nc.py script analogs): reference binaries ->
    NetCDF with coordinates, values matching the raw readers."""
    from scipy.io import netcdf_file
    from tlab_tpu.io import reference_formats as rf
    from tlab_tpu.tools import convert, postprocess as pp
    out = str(tmp_path)
    sim, st = _mk_inc(tmp_path, iter_extra="SavePlanes=2\nRestart=4",
                      extra="[SavePlanes]\nPlanesJ=7,15\n"
                            "[SaveTowers]\nStride=8,2,1\n")
    dns_tool.run(sim, st, outdir=out, n_steps=4)
    ncp = convert.planes_to_nc(sim, out, [2, 4])
    assert len(ncp) == 2
    with netcdf_file(ncp[0], "r", mmap=False) as f:
        vx = np.array(f.variables["VelocityX"][:])
        assert vx.shape == (2,) + (sim.grid.shape[0], sim.grid.shape[2])
    raw = rf.read_planes_file(os.path.join(out, "planesJ.2"), "j",
                              sim.grid.shape, 5, 2)
    assert np.allclose(raw[0], vx)
    nct = convert.towers_to_nc(sim, out)
    with netcdf_file(nct, "r", mmap=False) as f:
        u = np.array(f.variables["VelocityX"][:])
        y = np.array(f.variables["y"][:])
    assert u.shape[1] == len(y) == (sim.grid.shape[1] + 1) // 2
    assert np.all(np.isfinite(u))
    pp.run_averages(sim, out, [4])
    nca = convert.stats_to_nc(out, [4])
    with netcdf_file(nca[0], "r", mmap=False) as f:
        assert "rU" in f.variables or len(f.variables) > 10


def test_extended_visuals_menu(tmp_path):
    """r4 visuals menu additions (reference visuals.f90 plot_file set):
    equation fields, Tke, stress/Reynolds tensors write finite f32
    fields via the CLI."""
    import subprocess, sys
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ini = os.path.join(REPO, "tests", "data", "case01_small.ini")
    out = str(tmp_path)
    for cmd in (["ini"], ["dns"]):
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *cmd, "--cpu",
             "--ini", ini, "--outdir", out],
            cwd=REPO, capture_output=True, text=True, timeout=1200)
        assert r.returncode == 0, r.stderr[-1500:]
    r = subprocess.run(
        [sys.executable, "-m", "tlab_tpu.tools.cli", "visuals", "--cpu",
         "--ini", ini, "--outdir", out, "--files", "10", "--fields",
         "Tke,StressTensor,ReynoldsTensor,EnstrophyProduction,"
         "StrainPressure,LogDissipation,ScalarGradientProduction"],
        cwd=REPO, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-1500:]
    from tlab_tpu.io import fields_io
    from tlab_tpu.config import load_case
    shp = Simulation.from_case(load_case(ini)).grid.shape
    for n in ("vis10.Tke", "vis10.StressTensorxy", "vis10.ReynoldsTensoruv",
              "vis10.EnstrophyProduction", "vis10.StrainPressure",
              "vis10.ScalarGradientProduction"):
        a = fields_io.read_visual(os.path.join(out, n), shp)
        assert np.isfinite(a).all(), n
    a = fields_io.read_visual(os.path.join(out, "vis10.Tke"), shp)
    assert (a >= 0).all()


def test_paramvisuals_menu_numbers(tmp_path):
    """[PostProcessing] ParamVisuals batch indices follow the reference
    menu exactly (visuals.f90:179-213, iscal_offset=9): 4=VelocityVector,
    13=VorticityVector, 16=StrainTensor — each a per-component raw-f32
    file set."""
    import subprocess, sys
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = open(os.path.join(REPO, "tests", "data",
                            "case01_small.ini")).read()
    src += "\n[PostProcessing]\nFiles=10\nParamVisuals=4,13,16\n"
    ini = str(tmp_path / "tlab.ini")
    open(ini, "w").write(src)
    out = str(tmp_path)
    for cmd in (["ini"], ["dns"]):
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *cmd, "--cpu",
             "--ini", ini, "--outdir", out],
            cwd=REPO, capture_output=True, text=True, timeout=1200)
        assert r.returncode == 0, r.stderr[-1500:]
    r = subprocess.run(
        [sys.executable, "-m", "tlab_tpu.tools.cli", "visuals", "--cpu",
         "--ini", ini, "--outdir", out],
        cwd=REPO, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-1500:]
    from tlab_tpu.io import fields_io
    from tlab_tpu.config import load_case
    shp = Simulation.from_case(load_case(ini)).grid.shape
    for n in ("vis10.VelocityVector1", "vis10.VelocityVector2",
              "vis10.VelocityVector3", "vis10.VorticityVector1",
              "vis10.VorticityVector3", "vis10.StrainTensor1",
              "vis10.StrainTensor6"):
        a = fields_io.read_visual(os.path.join(out, n), shp)
        assert np.isfinite(a).all(), n
    u = fields_io.read_field(os.path.join(out, "flow.10.1"))[0]
    vv = fields_io.read_visual(os.path.join(out, "vis10.VelocityVector1"),
                               shp)
    assert np.allclose(vv, u, atol=1e-6)


def test_pressure_visual_family(tmp_path):
    """The visuals Pressure suite (visuals.f90 option 8): gradient power,
    pressure-strain correlations, hydrostatic/hydrodynamic split and the
    DCMP_* decomposition files."""
    import subprocess, sys
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = open(os.path.join(REPO, "tests", "data",
                            "case01_small.ini")).read()
    src = src.replace("[Main]", "[BodyForce]\nType=Linear\n"
                      "Vector=0.0,1.0,0.0\nParameters=0.5\n\n[Main]", 1)
    ini = str(tmp_path / "tlab.ini")
    open(ini, "w").write(src)
    out = str(tmp_path)
    for cmd in (["ini"], ["dns"]):
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *cmd, "--cpu",
             "--ini", ini, "--outdir", out],
            cwd=REPO, capture_output=True, text=True, timeout=1200)
        assert r.returncode == 0, r.stderr[-1500:]
    r = subprocess.run(
        [sys.executable, "-m", "tlab_tpu.tools.cli", "visuals", "--cpu",
         "--ini", ini, "--outdir", out, "--files", "10", "--fields",
         "PressureGradientPower,PressureStrainY,PressureHydrostatic,"
         "PressureHydrodynamic,PressureBuoyancy,PressureAdvDiff,"
         "LaplacianB,GradientRi,Fvb,Cvb"],
        cwd=REPO, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-1500:]
    from tlab_tpu.io import fields_io
    from tlab_tpu.config import load_case
    shp = Simulation.from_case(load_case(ini)).grid.shape
    ph = fields_io.read_visual(
        os.path.join(out, "vis10.PressureHydrostatic"), shp)
    pd = fields_io.read_visual(
        os.path.join(out, "vis10.PressureHydrodynamic"), shp)
    assert np.isfinite(ph).all() and np.isfinite(pd).all()
    # the split is exact: hydrostatic + hydrodynamic == total pressure
    r = subprocess.run(
        [sys.executable, "-m", "tlab_tpu.tools.cli", "visuals", "--cpu",
         "--ini", ini, "--outdir", out, "--files", "10", "--fields",
         "PressureTotal"],
        cwd=REPO, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-1500:]
    pt = fields_io.read_visual(
        os.path.join(out, "vis10.PressureTotal"), shp)
    scale = max(1e-30, np.max(np.abs(pt)))
    assert np.max(np.abs(ph + pd - pt)) < 1e-5 * scale
