"""Mini versions of the reference's example-case families (examples/README):
3-D shear layer, Rayleigh-Benard convection, rotating Ekman layer.
Each runs the full driver pipeline and checks family-specific physics.
"""
import numpy as np
import jax
import jax.numpy as jnp

from tlab_tpu.config import load_case, Ini
from tlab_tpu.dycore import incompressible as dyn
from tlab_tpu.dycore.state import State
from tlab_tpu.runtime import Simulation
from tlab_tpu.tools import dns as dns_tool
from tlab_tpu.tools.initialize import initial_state

SHEAR3D = """
[Main]
Type=temporal
Equations=incompressible
SpaceOrder=CompactJacobian6
TimeOrder=RungeKuttaExplicit4
TimeCFL=1.0
[Parameters]
Reynolds=800
Schmidt=1.0
[Iteration]
Start=0
End=10
Restart=0
Statistics=0
IteraLog=1
[Grid]
XPeriodic=yes
YPeriodic=no
ZPeriodic=yes
[Flow]
ProfileVelocityX=Tanh
ThickVelocityX=0.05
DeltaVelocityX=1.0
[Scalar]
ProfileScalar1=Tanh
ThickScalar1=0.05
DeltaScalar1=-1.0
MeanScalar1=0.5
[BoundaryConditions]
VelocityJmin=freeslip
VelocityJmax=freeslip
Scalar1Jmin=neumann
Scalar1Jmax=neumann
[IniFields]
Velocity=VorticityBroadband
ProfileIniK=GaussianSurface
ThickIniK=0.05
NormalizeK=0.01
[Broadband]
Spectrum=quadratic
f0=4.0
[IniGridOx]
periodic=yes
segments=1
points_1=33
scales_1=2.0
opts_1=uniform
[IniGridOy]
periodic=no
segments=1
points_1=48
scales_1=1.0
opts_1=uniform
[IniGridOz]
periodic=yes
segments=1
points_1=17
scales_1=1.0
opts_1=uniform
"""


def test_shear_layer_3d():
    """3-D temporal shear layer (reference Cases 01-08 family): runs with
    adaptive dt; TKE grows from the broadband seed (KH instability) while
    the scalar stays bounded."""
    sim = Simulation.from_case(load_case(Ini(text=SHEAR3D)))
    state = initial_state(sim, seed=11)
    assert sim.grid.shape == (32, 48, 16)
    from tlab_tpu.stats import averages
    tke0 = float(jnp.max(averages.flow_statistics(
        sim.P, state, sim.nsp.visc)["Tke"]))
    run = dns_tool.run(sim, state, outdir="/tmp/shear3d_case", n_steps=10)
    out = run.state
    assert np.isfinite(np.asarray(out.u)).all()
    assert float(jnp.max(out.s)) <= 1.0 + 1e-6
    assert float(jnp.min(out.s)) >= -1e-6
    tkeN = float(jnp.max(averages.flow_statistics(
        sim.P, out, sim.nsp.visc)["Tke"]))
    assert 0.1 * tke0 < tkeN < 50 * tke0


RAYLEIGH_BENARD = """
[Main]
Type=temporal
Equations=incompressible
SpaceOrder=CompactJacobian6
TimeOrder=RungeKuttaExplicit3
TimeCFL=0.8
[Control]
ScalLimit=yes
MinScalar=0.0
MaxScalar=1.0
[Parameters]
Reynolds=100
Schmidt=1.0
Froude=0.01
[BoundaryConditions]
VelocityJmin=noslip
VelocityJmax=noslip
Scalar1Jmin=dirichlet
Scalar1Jmax=dirichlet
[Scalar]
ProfileScalar1=Linear
DeltaScalar1=1.0
MeanScalar1=0.5
[BodyForce]
Type=Linear
Vector=0.0,1.0,0.0
Parameters=1.0
[IniGridOx]
periodic=yes
segments=1
points_1=49
scales_1=4.0
opts_1=uniform
[IniGridOy]
periodic=no
segments=1
points_1=33
scales_1=1.0
opts_1=uniform
[IniGridOz]
periodic=no
segments=1
points_1=1
scales_1=1.0
opts_1=uniform
"""


def test_rayleigh_benard_instability():
    """RB convection (reference Cases 10-13 family): hot plate below
    (unstable stratification, Ra ~ 1e6 >> Ra_c); a seeded perturbation grows
    and develops convective heat flux <v's'> > 0."""
    case = load_case(Ini(text=RAYLEIGH_BENARD))
    sim = Simulation.from_case(case)
    nx, ny, nz = sim.grid.shape
    y = sim.grid.y.nodes
    X = sim.grid.x.nodes[:, None, None]
    Y = y[None, :, None]
    # linear profile: delta=1, mean=0.5 -> s = 0.5 - (y - 0.5): hot below
    s0 = case.scal_profiles[0](y)
    assert s0[0] > s0[-1]
    pert = 1e-3 * np.sin(2 * np.pi * X / 4.0) * np.sin(np.pi * Y)
    state = State(u=jnp.zeros((nx, ny, nz)),
                  v=jnp.asarray(pert * np.ones((nx, ny, nz))),
                  w=jnp.zeros((nx, ny, nz)),
                  s=jnp.asarray(np.broadcast_to(s0[None, :, None],
                                                (nx, ny, nz)))[None])
    dt = 2e-3
    step = jax.jit(lambda st: dyn.rk_step(sim.P, st, dt)[0])
    v_amp = [float(jnp.max(jnp.abs(state.v)))]
    for _ in range(6):
        for _ in range(50):
            state = step(state)
        v_amp.append(float(jnp.max(jnp.abs(state.v))))
    # instability: after the initial transient (the seed is not an
    # eigenmode), the convection amplitude grows from its minimum
    assert v_amp[-1] > 3.0 * min(v_amp), v_amp
    assert v_amp[-1] > v_amp[-2] > v_amp[-3]
    flux = float(jnp.mean(state.v * (state.s[0] - jnp.mean(state.s[0]))))
    assert flux > 0.0                     # upward heat flux


EKMAN = """
[Main]
Type=temporal
Equations=incompressible
SpaceOrder=CompactJacobian6
TimeOrder=RungeKuttaExplicit3
TimeCFL=0.8
[Control]
ScalLimit=no
[Parameters]
Reynolds=400
Schmidt=1.0
Rossby=1.0
[Iteration]
ObsLog=ekman
[BoundaryConditions]
VelocityJmin=noslip
VelocityJmax=freeslip
Scalar1Jmin=neumann
Scalar1Jmax=neumann
[Rotation]
Type=normalized
Vector=0.0,1.0,0.0
Parameters=0.0,1.0
[IniGridOx]
periodic=yes
segments=1
points_1=17
scales_1=2.0
opts_1=uniform
[IniGridOy]
periodic=no
segments=1
points_1=64
scales_1=2.0
opts_1=uniform
[IniGridOz]
periodic=no
segments=1
points_1=1
scales_1=1.0
opts_1=uniform
"""


def test_ekman_spiral():
    """Rotating boundary layer (reference Cases 70/81-88 family): starting
    from the geostrophic wind with a no-slip bottom, rotation turns the
    near-wall flow to the left of the geostrophic wind (northern-hemisphere
    Ekman veering: w > 0 near the wall for G = (1, 0, 0))."""
    sim = Simulation.from_case(load_case(Ini(text=EKMAN)))
    nx, ny, nz = sim.grid.shape
    y = sim.grid.y.nodes
    u0 = np.ones((nx, ny, nz))            # geostrophic wind u = G = 1
    u0[:, 0, :] = 0.0                     # no-slip wall
    state = State(u=jnp.asarray(u0), v=jnp.zeros((nx, ny, nz)),
                  w=jnp.zeros((nx, ny, nz)), s=jnp.zeros((1, nx, ny, nz)))
    dt = 5e-3
    step = jax.jit(lambda st: dyn.rk_step(sim.P, st, dt)[0])
    for _ in range(200):
        state = step(state)
    W = np.asarray(jnp.mean(state.w, axis=(0, 2)))
    U = np.asarray(jnp.mean(state.u, axis=(0, 2)))
    # near-wall deficit in u and nonzero cross-flow w of one dominant sign
    assert U[1] < 0.9
    near_wall = W[1:ny // 3]
    assert np.max(np.abs(near_wall)) > 1e-3
    significant = near_wall[np.abs(near_wall) > 1e-4]
    assert significant.size > 3
    assert np.all(np.sign(significant) == np.sign(significant[0]))


SPATIAL_JET = """
[Main]
Type=spatial
Equations=incompressible
SpaceOrder=CompactJacobian6
TimeOrder=RungeKuttaExplicit3
TimeCFL=0.7
[Control]
ScalLimit=no
[Parameters]
Reynolds=500
Schmidt=1.0
[Iteration]
Start=0
End=60
Restart=60
Statistics=0
IteraLog=10
[Flow]
ProfileVelocityX=Bickley
ThickVelocityX=0.08
DeltaVelocityX=1.0
VelocityX=0.05
[Scalar]
ProfileScalar1=Gaussian
ThickScalar1=0.08
DeltaScalar1=1.0
[BoundaryConditions]
VelocityJmin=freeslip
VelocityJmax=freeslip
Scalar1Jmin=neumann
Scalar1Jmax=neumann
[BufferZone]
Type=relaxation
PointsImin=8
PointsImax=12
ParametersJmin=2.0,2.0
[IniGridOx]
periodic=yes
segments=1
points_1=65
scales_1=4.0
opts_1=uniform
[IniGridOy]
periodic=no
segments=1
points_1=48
scales_1=2.0
opts_1=uniform
[IniGridOz]
periodic=no
segments=1
points_1=1
scales_1=1.0
opts_1=uniform
"""


def test_spatial_jet(tmp_path):
    """Spatially developing jet (reference spatial mode): inflow Bickley jet
    held by the Imin buffer, outflow damped by the Imax buffer; the jet
    persists downstream and spatial running statistics accumulate."""
    sim = Simulation.from_case(load_case(Ini(text=SPATIAL_JET)))
    nx, ny, nz = sim.grid.shape
    y = sim.grid.y.nodes
    prof = sim.case.vel_profiles[0](y)          # co-flow + Bickley jet
    state = State(
        u=jnp.asarray(np.broadcast_to(prof[None, :, None], (nx, ny, nz))),
        v=jnp.zeros((nx, ny, nz)), w=jnp.zeros((nx, ny, nz)),
        s=jnp.asarray(np.broadcast_to(
            sim.case.scal_profiles[0](y)[None, :, None], (nx, ny, nz)))[None])
    run = dns_tool.run(sim, state, outdir=str(tmp_path), n_steps=60)
    out = run.state
    assert np.isfinite(np.asarray(out.u)).all()
    U = np.asarray(out.u[:, :, 0])
    jc = ny // 2
    # the jet core persists through the interior (between the buffers)
    assert U[nx // 2, jc] > 0.5 * float(prof[jc])
    # centerline exceeds the co-flow everywhere in the interior
    assert np.all(U[8:-12, jc] > 0.2)
    # spatial running statistics were accumulated and saved
    import glob
    st = glob.glob(str(tmp_path / "st*.npz"))
    assert len(st) == 1
    from tlab_tpu.stats.spatial import SpatialStats
    ss = SpatialStats.load(st[0])
    assert ss.n_samples == 60
    assert ss.mean("u").shape == (nx, ny)
    assert np.all(ss.variance("u") > -1e-12)


def test_spatial_jet_unsteady_inflow(tmp_path):
    """Unsteady inflow (reference boundary_inflow.f90 role): a stored box of
    inflow planes swept past Imin drives a time-varying v at the inlet; the
    perturbation propagates downstream without blow-up and the outlet state
    differs from the steady-inflow run."""
    from tlab_tpu.dycore.inflow import InflowBox

    sim = Simulation.from_case(load_case(Ini(text=SPATIAL_JET)))
    nx, ny, nz = sim.grid.shape
    y = sim.grid.y.nodes
    prof = sim.case.vel_profiles[0](y)
    state = State(
        u=jnp.asarray(np.broadcast_to(prof[None, :, None], (nx, ny, nz))),
        v=jnp.zeros((nx, ny, nz)), w=jnp.zeros((nx, ny, nz)),
        s=jnp.asarray(np.broadcast_to(
            sim.case.scal_profiles[0](y)[None, :, None], (nx, ny, nz)))[None])

    # inflow box: jet profile u + sinusoidal-in-x transverse forcing v that
    # Taylor-sweeps past the inlet as v_in(t) = A g(y) sin(2 pi Uc t / Lx)
    nbox = 32
    amp, lx_box, uc = 0.03, 2.0, 1.0
    g = np.exp(-((y - y[ny // 2]) / 0.2) ** 2)
    phases = np.sin(2 * np.pi * np.arange(nbox) / nbox)
    box = {
        "u": np.broadcast_to(prof[None, :], (nbox, ny)).copy(),
        "v": amp * phases[:, None] * g[None, :],
        "w": np.zeros((nbox, ny)),
        "s0": np.broadcast_to(sim.case.scal_profiles[0](y)[None, :],
                              (nbox, ny)).copy(),
    }
    inflow = InflowBox(fields=box, u_convect=uc, lx=lx_box)

    run = dns_tool.run(sim, state, outdir=str(tmp_path), n_steps=60,
                       inflow=inflow)
    out = run.state
    assert np.isfinite(np.asarray(out.u)).all()
    # the oscillating inflow imprints a nonzero v near the inlet strip
    v_in = np.asarray(out.v[:10, :, 0])
    assert np.max(np.abs(v_in)) > 1e-4
    # jet survives downstream
    U = np.asarray(out.u[:, :, 0])
    assert U[nx // 2, ny // 2] > 0.5 * float(prof[ny // 2])


def test_spatial_jet_filter_sponge(tmp_path):
    """BufferZone Type=both: relaxation strips plus the filter-type sponge
    (reference BOUNDARY_BUFFER_FILTER, stubbed there, working here). The
    outflow strip is smoother (less streamwise variance) than the
    relaxation-only run and the field stays finite."""
    ini_both = SPATIAL_JET.replace("Type=relaxation", "Type=both")
    sim = Simulation.from_case(load_case(Ini(text=ini_both)))
    assert sim.filter_sponge is None          # set at attach_buffer time
    nx, ny, nz = sim.grid.shape
    y = sim.grid.y.nodes
    prof = sim.case.vel_profiles[0](y)
    mk = lambda: State(
        u=jnp.asarray(np.broadcast_to(prof[None, :, None], (nx, ny, nz))),
        v=jnp.zeros((nx, ny, nz)), w=jnp.zeros((nx, ny, nz)),
        s=jnp.asarray(np.broadcast_to(
            sim.case.scal_profiles[0](y)[None, :, None], (nx, ny, nz)))[None])
    run = dns_tool.run(sim, mk(), outdir=str(tmp_path), n_steps=40)
    assert sim.filter_sponge is not None
    out = run.state
    assert np.isfinite(np.asarray(out.u)).all()
    U = np.asarray(out.u[:, :, 0])
    assert U[nx // 2, ny // 2] > 0.5 * float(prof[ny // 2])

    # amp profile: zero in the interior, ~1 at the outflow wall
    amp = np.asarray(sim.filter_sponge[0]).ravel()
    assert amp[nx // 2] == 0.0
    assert amp[-1] > 0.9


def test_interactive_surface_bc():
    """Linear (interactive) surface BC: the wall scalar value picks up the
    local flux anomaly (reference BOUNDARY_BCS_SURFACE_Y SfcType=linear),
    while the plane-mean wall value is unchanged (only the anomaly
    couples). A static wall stays exactly pinned."""
    ini_txt = TAYLOR_GREEN_INI if False else """
[Main]
Type=temporal
Equations=incompressible
SpaceOrder=CompactJacobian6
TimeOrder=RungeKuttaExplicit3
TimeCFL=0.8
[Control]
ScalLimit=no
[Parameters]
Reynolds=100
Schmidt=1.0
[Flow]
ProfileVelocityX=none
[Scalar]
ProfileScalar1=Linear
ThickScalar1=1.0
DeltaScalar1=1.0
[BoundaryConditions]
VelocityJmin=noslip
VelocityJmax=noslip
Scalar1Jmin=dirichlet
Scalar1Jmax=dirichlet
Scalar1SfcTypeJmin=linear
Scalar1CouplingJmin=0.5
[IniGridOx]
periodic=yes
segments=1
points_1=32
scales_1=2.0
[IniGridOy]
periodic=no
segments=1
points_1=33
scales_1=1.0
opts_1=uniform
[IniGridOz]
periodic=yes
segments=1
points_1=8
scales_1=1.0
"""
    sim = Simulation.from_case(load_case(Ini(text=ini_txt)),
                               dtype=jnp.float64)
    assert "surface_bc" in sim.P
    nx, ny, nz = sim.grid.shape
    y = sim.grid.y.nodes
    x = sim.grid.x.nodes[:, None, None]
    # scalar with an x-varying near-wall gradient -> flux anomaly at jmin
    s0 = (y[None, :, None] * (1.0 + 0.3 * np.cos(2 * np.pi * x / 2.0))
          * np.ones((1, 1, nz)))
    state = State(u=jnp.zeros((nx, ny, nz)), v=jnp.zeros((nx, ny, nz)),
                  w=jnp.zeros((nx, ny, nz)),
                  s=jnp.asarray(s0)[None])
    wall0 = np.asarray(state.s[0, :, 0, :]).copy()
    new_state, _ = dyn.rk_step(sim.P, state, 1e-3)
    wall1 = np.asarray(new_state.s[0, :, 0, :])
    dw = wall1 - wall0
    # anomaly-coupled: plane mean unchanged, but x-variation imprinted.
    # The wall moves with VELOCITY ref (ref accumulating cpl*anom per
    # substep, reference hs wall-row = BcsScal%ref), so one step imprints
    # O(dt^2 cpl flux') -- small but structured
    assert abs(dw.mean()) < 1e-12
    assert np.max(np.abs(dw)) > 1e-8
    # sign: where the gradient (flux) is larger than average, wall warms
    flux = np.asarray(s0[:, 1, :] - s0[:, 0, :])
    corr = np.corrcoef(dw.ravel(), (flux - flux.mean()).ravel())[0, 1]
    assert corr > 0.99

    # static surface stays pinned
    ini2 = ini_txt.replace("Scalar1SfcTypeJmin=linear\n", "") \
                  .replace("Scalar1CouplingJmin=0.5\n", "")
    sim2 = Simulation.from_case(load_case(Ini(text=ini2)),
                                dtype=jnp.float64)
    assert "surface_bc" not in sim2.P
    ns2, _ = dyn.rk_step(sim2.P, state, 1e-3)
    assert np.max(np.abs(np.asarray(ns2.s[0, :, 0, :]) - wall0)) < 1e-14


def test_consistency_check():
    """INI option cross-validation (reference tlab_consistency_check.f90):
    bad combinations are rejected with a clear error at setup time."""
    import pytest
    from tlab_tpu.config import load_case, consistency_check, Ini
    base = open("tests/data/case01_small.ini").read()

    # valid case passes
    consistency_check(load_case(Ini(text=base)))

    # temporal + non-periodic x
    bad = base.replace("XPeriodic=yes", "XPeriodic=no")
    with pytest.raises(ValueError, match="periodic in direction X"):
        consistency_check(load_case(Ini(text=bad)))

    # version gate
    bad = base.replace("Major=7", "Major=6")
    with pytest.raises(ValueError, match="version must be 7"):
        consistency_check(load_case(Ini(text=bad)))

    # staggering constraints
    bad = base + "\n[Staggering]\nStaggerHorizontalPressure=yes\n"
    bad = bad.replace("SpaceOrder=CompactJacobian6",
                      "SpaceOrder=CompactJacobian4")
    with pytest.raises(ValueError, match="staggering"):
        consistency_check(load_case(Ini(text=bad)))

    # anelastic requires an airwater-family mixture
    bad = base.replace("Equations=incompressible", "Equations=anelastic")
    bad += "\n[Thermodynamics]\nMixture=airwaterlinear\n"
    with pytest.raises(ValueError, match="anelastic mode requires"):
        consistency_check(load_case(Ini(text=bad)))


def test_inflow_box_reference_semantics():
    """Broadband inflow machinery (boundary_inflow.f90:194-433): cubic
    sweep sampling recovering a smooth signal, 3-D planes, transient
    ramp, y-centering, and the mode-3 box sequence."""
    from tlab_tpu.dycore.inflow import InflowBox, _catmull_rom_weights

    # cubic interpolation is exact for cubics on the periodic samples
    nx_i, ny, nz = 64, 8, 4
    lx = 2.0
    x = np.arange(nx_i) / nx_i * lx
    sig = np.sin(2 * np.pi * x / lx)
    box = {"u": np.broadcast_to(sig[:, None, None],
                                (nx_i, ny, nz)).copy()}
    uc = 1.0
    ib = InflowBox(fields=box, u_convect=uc, lx=lx)
    for t in (0.13, 0.77, 1.4, 2.9):
        plane = np.asarray(ib.refs_at(t)["u"])
        assert plane.shape == (1, ny, nz)
        xaux = lx - (uc * t % lx)
        expect = np.sin(2 * np.pi * xaux / lx)
        assert abs(plane[0, 0, 0] - expect) < 5e-4, (t, plane[0, 0, 0],
                                                     expect)
    # weights sum to one
    assert abs(sum(_catmull_rom_weights(0.3)) - 1.0) < 1e-14

    # transient ramp
    ib2 = InflowBox(fields=box, u_convect=uc, lx=lx, adapt=1.0)
    p_half = np.asarray(ib2.refs_at(0.5)["u"])
    p_ref = np.asarray(InflowBox(fields=box, u_convect=uc,
                                 lx=lx).refs_at(0.5)["u"])
    assert np.allclose(p_half, 0.5 * p_ref)

    # y-centering of a smaller inflow grid
    p_pad = np.asarray(ib.refs_at(0.13, ny=14)["u"])
    assert p_pad.shape == (1, 14, nz)
    assert np.allclose(p_pad[0, 3:11], np.asarray(ib.refs_at(0.13)["u"])[0])

    # mode-3 sequence: boxes cycle as the sweep exhausts each box
    box2 = {"u": 2.0 * box["u"]}
    seq = InflowBox(fields=box, u_convect=uc, lx=lx,
                    boxes=[box, box2])
    a = np.asarray(seq.refs_at(0.3)["u"])       # first box
    b = np.asarray(seq.refs_at(lx + 0.3)["u"])  # second box
    assert np.allclose(b, 2.0 * a)


def test_dt_lag_pipelining():
    """[Iteration] DtLag=yes: the adaptive dt uses the previous step's
    CFL (no per-step device sync); the run completes with a dt history
    close to the synchronous one."""
    import tempfile, os
    from tlab_tpu.config import load_case, Ini
    from tlab_tpu.runtime import Simulation
    from tlab_tpu.tools.initialize import initial_state
    from tlab_tpu.tools import dns as dns_tool
    base = open("tests/data/case01_small.ini").read()
    base = base.replace("End=10", "End=6")
    outs = {}
    for lag in ("no", "yes"):
        txt = base.replace("[Iteration]", f"[Iteration]\nDtLag={lag}")
        sim = Simulation.from_case(load_case(Ini(text=txt)))
        state = initial_state(sim, seed=3)
        with tempfile.TemporaryDirectory() as d:
            run = dns_tool.run(sim, state, outdir=d, checkpoint=False)
        dts = [float(l.split()[3]) for l in run.log.lines
               if not l.startswith("#") and len(l.split()) > 4]
        outs[lag] = (dts, run.itime)
    assert outs["yes"][1] == outs["no"][1] == 6
    a = np.asarray(outs["no"][0][1:])
    b = np.asarray(outs["yes"][0][1:])
    # lagged dts track the synchronous ones (one-step stale + 3% safety
    # keeps them slightly SMALLER -- conservative by construction)
    assert np.all(np.abs(b / a - 1.0) < 0.12), (a, b)
    assert np.all(b <= a * 1.001), (a, b)


def test_profile_families_complete():
    """All 20 parseable reference profile families evaluate
    (profiles.f90:81-101) incl. the post-term specials."""
    from tlab_tpu.physics.profiles import Profile, der_to_thick, der_to_delta
    y = np.linspace(0.0, 1.0, 64)
    names = ("none", "tanh", "tanhsymmetric", "tanhantisymmetric",
             "linear", "linearcrop", "erf", "erfsurface", "erfantisym",
             "bickley", "gaussian", "gaussiansurface",
             "gaussianvaricose", "gaussiansinuous", "ekmanu", "ekmanp",
             "parabolic", "parabolicsurface", "mixedlayer",
             "gaussiantanhsymmetric")
    for name in names:
        p = Profile(type=name, mean=0.3, delta=1.0, thick=0.1, ymean=0.5,
                    diam=0.2, lslope=0.1, uslope=-0.2,
                    surface_thick=0.05, surface_delta=0.4)
        f = p(y)
        assert np.isfinite(f).all(), name
    # erfsurface adds the surface term near y=0
    pe = Profile(type="erfsurface", delta=0.0, thick=0.1, ymean=0.5,
                 surface_thick=0.05, surface_delta=1.0)
    pb = Profile(type="erf", delta=0.0, thick=0.1, ymean=0.5)
    d = pe(y) - pb(y)
    # at y=0 the surface term is exactly 0.5*SurfaceDelta, decaying above
    assert abs(d[0] - 0.5) < 1e-12 and abs(d[-1]) < 1e-6
    # ekmanp differs from ekmanu by the perturbation
    pu = Profile(type="ekmanu", delta=1.0, thick=0.1)
    pp_ = Profile(type="ekmanp", delta=1.0, thick=0.1)
    assert np.max(np.abs(pu(y) - pp_(y))) > 0.0
    # derivative alternative input round-trips
    th = der_to_thick("tanh", 1.0, -2.5)
    assert abs(der_to_delta("tanh", th, -2.5) - 1.0) < 1e-14


def test_profile_ini_keys():
    """LowerSlope/UpperSlope/Diam/SurfaceThick/SurfaceDelta/YMean and
    Derivative keys reach the Profile (Profiles_ReadBlock)."""
    from tlab_tpu.config import Ini, _read_profile
    txt = """
[Scalar]
ProfileScalar1=Erf
DeltaScalar1=2.0
DerivativeScalar1=-4.0
LowerSlopeScalar1=0.3
UpperSlopeScalar1=-0.1
YMeanScalar1=0.77
SurfaceThickScalar1=0.02
SurfaceDeltaScalar1=0.5
"""
    p = _read_profile(Ini(text=txt), "scalar", "Scalar1", 1.0)
    assert p.lslope == 0.3 and p.uslope == -0.1
    assert p.ymean == 0.77
    assert p.surface_thick == 0.02 and p.surface_delta == 0.5
    # thick derived from the derivative: -delta/(der - uslope)/(2 sqrt(pi))
    expect = -2.0 / (-4.0 - (-0.1)) / (2.0 * np.sqrt(np.pi))
    assert abs(p.thick - expect) < 1e-14
