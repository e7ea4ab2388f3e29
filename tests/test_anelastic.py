"""Anelastic equation set: background steadiness + buoyant-bubble ascent."""
import numpy as np
import jax
import jax.numpy as jnp

from tlab_tpu.config import load_case, Ini
from tlab_tpu.dycore import incompressible as dyn
from tlab_tpu.dycore.state import State
from tlab_tpu.runtime import Simulation

INI_TEXT = """
[Main]
Type=temporal
Equations=anelastic
SpaceOrder=CompactJacobian6
TimeOrder=RungeKuttaExplicit3
TimeCFL=0.8
[Control]
ScalLimit=no
[Parameters]
Reynolds=10000
Schmidt=1.0,1.0
Froude=1.0
[Thermodynamics]
Mixture=airwater
ScaleHeight=20.0
[Grid]
Imax=32
Jmax=40
Kmax=1
XPeriodic=yes
YPeriodic=no
ZPeriodic=no
XUniform=yes
YUniform=yes
ZUniform=yes
[Scalar]
ProfileScalar1=Linear
DeltaScalar1=0.0
MeanScalar1=1.0
ProfileScalar2=None
MeanScalar2=0.005
[BoundaryConditions]
VelocityJmin=freeslip
VelocityJmax=freeslip
Scalar1Jmin=neumann
Scalar1Jmax=neumann
Scalar2Jmin=neumann
Scalar2Jmax=neumann
[BodyForce]
Type=explicit
Vector=0.0,1.0,0.0
[IniGridOx]
periodic=yes
segments=1
points_1=33
scales_1=2.0
opts_1=uniform
[IniGridOy]
periodic=no
segments=1
points_1=40
scales_1=1.0
opts_1=uniform
[IniGridOz]
periodic=no
segments=1
points_1=1
scales_1=1.0
opts_1=uniform
"""


def _background_state(sim):
    nx, ny, nz = sim.grid.shape
    y = sim.grid.y.nodes
    h = sim.case.scal_profiles[0](y)
    qt = sim.case.scal_profiles[1](y)
    # h must include the potential energy ep(y) for a neutral atmosphere
    from tlab_tpu.physics import thermo
    tp = thermo.ThermoParams(mixture="airwater", scale_height_inv=1.0 / 20.0)
    h = h + tp.scale_height_inv * (y - y[0])
    z3 = jnp.zeros((nx, ny, nz))
    s = jnp.stack([jnp.broadcast_to(jnp.asarray(h)[None, :, None], (nx, ny, nz)),
                   jnp.broadcast_to(jnp.asarray(qt)[None, :, None], (nx, ny, nz))])
    return State(u=z3, v=z3, w=z3, s=s)


def make_sim():
    case = load_case(Ini(text=INI_TEXT))
    # background hydrostatic profiles must match the state: make the
    # h-profile include ep implicitly via a custom profile is involved;
    # instead rebuild the sim with profiles matching _background_state
    import dataclasses
    from tlab_tpu.physics.profiles import Profile
    h_prof = Profile(type="linear", mean=1.0 + 0.5 * (1.0 / 20.0),
                     delta=-1.0 / 20.0, thick=1.0, ymean=0.5)
    # linear profile: f = mean + delta * (-(y-ymean)/thick) = mean - delta*(y-0.5)
    case = dataclasses.replace(case,
                               scal_profiles=(h_prof, case.scal_profiles[1]))
    return Simulation.from_case(case)


def test_background_is_steady():
    sim = make_sim()
    nx, ny, nz = sim.grid.shape
    y = sim.grid.y.nodes
    h = sim.case.scal_profiles[0](y)
    qt = sim.case.scal_profiles[1](y)
    z3 = jnp.zeros((nx, ny, nz))
    state = State(u=z3, v=z3, w=z3,
                  s=jnp.stack([jnp.broadcast_to(jnp.asarray(h)[None, :, None], (nx, ny, nz)),
                               jnp.broadcast_to(jnp.asarray(qt)[None, :, None], (nx, ny, nz))]))
    step = jax.jit(lambda st: dyn.rk_step(sim.P, st, 1e-3)[0])
    out = state
    for _ in range(5):
        out = step(out)
    # background in discrete hydrostatic balance: velocities stay tiny
    assert float(jnp.max(jnp.abs(out.v))) < 1e-8
    assert float(jnp.max(jnp.abs(out.s[0] - state.s[0]))) < 1e-8


def test_warm_bubble_rises():
    sim = make_sim()
    nx, ny, nz = sim.grid.shape
    y = sim.grid.y.nodes
    X = sim.grid.x.nodes[:, None, None]
    Y = y[None, :, None]
    h = sim.case.scal_profiles[0](y)
    qt = sim.case.scal_profiles[1](y)
    bubble = 0.01 * np.exp(-(((X - 1.0) / 0.2) ** 2 + ((Y - 0.3) / 0.1) ** 2))
    s0 = np.broadcast_to(h[None, :, None], (nx, ny, nz)) + bubble
    s1 = np.broadcast_to(qt[None, :, None], (nx, ny, nz))
    z3 = jnp.zeros((nx, ny, nz))
    state = State(u=z3, v=z3, w=z3,
                  s=jnp.stack([jnp.asarray(s0), jnp.asarray(s1)]))
    step = jax.jit(lambda st: dyn.rk_step(sim.P, st, 2e-3)[0])
    for _ in range(20):
        state = step(state)
    # upward velocity develops at the bubble location
    vmax = float(jnp.max(state.v))
    assert vmax > 1e-5, vmax
    ix = np.argmin(np.abs(sim.grid.x.nodes - 1.0))
    v_at_bubble = float(jnp.max(state.v[ix, :, 0]))
    assert v_at_bubble > 0.5 * vmax


def test_gray_radiation_run():
    """Anelastic run with the gray (emitting) radiation variant stays
    finite and heats/cools the enthalpy scalar."""
    txt = INI_TEXT + """
[Infrared]
Type=gray
Scalar=1
BoundaryConditions=0.2, 1.0
AbsorptionComponent1=5.0
AbsorptionComponent2=0.1
AbsorptionComponent3=0.01
Beta=0.1
"""
    from tlab_tpu.tools.initialize import initial_state
    sim = Simulation.from_case(load_case(Ini(text=txt)))
    state = initial_state(sim, seed=3)
    s0 = np.asarray(state.s[0]).copy()
    st = state
    for _ in range(3):
        st, _ = dyn.rk_step(sim.P, st, 5e-4)
    assert np.isfinite(np.asarray(st.s)).all()
    ds = np.asarray(st.s[0]) - s0
    assert np.max(np.abs(ds)) > 0.0


def test_band_radiation_run():
    """Anelastic run with two-band radiation configured from the INI."""
    txt = INI_TEXT + """
[Infrared]
Type=band
Scalar=1
BoundaryConditions=0.2, 0.1, 1.0
AbsorptionComponent1=5.0, 2.0
AbsorptionComponent2=0.1, 0.05
AbsorptionComponent3=0.01, 0.0
BetaCoefficient1=0.6
BetaCoefficient2=0.0
BetaCoefficient3=0.0
Beta=0.1
"""
    from tlab_tpu.tools.initialize import initial_state
    sim = Simulation.from_case(load_case(Ini(text=txt)))
    st = initial_state(sim, seed=3)
    s0 = np.asarray(st.s[0]).copy()
    for _ in range(2):
        st, _ = dyn.rk_step(sim.P, st, 5e-4)
    assert np.isfinite(np.asarray(st.s)).all()
    assert np.max(np.abs(np.asarray(st.s[0]) - s0)) > 0.0
