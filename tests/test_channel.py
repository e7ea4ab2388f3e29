"""Pressure-driven channel (no-slip walls): the analytic Poiseuille profile
is a discrete steady state of the solver (reference channel cases 41-44,
driven by a homogeneous body force)."""
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
Equations=incompressible
SpaceOrder=CompactJacobian6
SpaceOrder2=CompactJacobian6
TimeOrder=RungeKuttaExplicit4
TimeCFL=1.0
[Control]
ScalLimit=no
[Parameters]
Reynolds=10
Schmidt=1.0
Froude=1.0
[BoundaryConditions]
VelocityJmin=noslip
VelocityJmax=noslip
Scalar1Jmin=neumann
Scalar1Jmax=neumann
[BodyForce]
Type=Homogeneous
Vector=1.0,0.0,0.0
Parameters=0.8
[IniGridOx]
periodic=yes
segments=1
points_1=9
scales_1=2.0
opts_1=uniform
[IniGridOy]
periodic=no
segments=1
points_1=49
scales_1=1.0
opts_1=uniform
[IniGridOz]
periodic=no
segments=1
points_1=1
scales_1=1.0
opts_1=uniform
"""


def test_poiseuille_steady_state():
    sim = Simulation.from_case(load_case(Ini(text=INI_TEXT)))
    nx, ny, nz = sim.grid.shape
    y = sim.grid.y.nodes
    nu = sim.nsp.visc                      # 0.1
    f = 0.8
    u_exact = (f / (2 * nu)) * y * (1.0 - y)     # u_max = 1 at center
    state = State(
        u=jnp.broadcast_to(jnp.asarray(u_exact)[None, :, None], (nx, ny, nz)),
        v=jnp.zeros((nx, ny, nz)), w=jnp.zeros((nx, ny, nz)),
        s=jnp.zeros((1, nx, ny, nz)))
    dt = 5e-4
    step = jax.jit(lambda st: dyn.rk_step(sim.P, st, dt)[0])
    out = state
    for _ in range(100):
        out = step(out)
    drift = float(jnp.max(jnp.abs(out.u - state.u)))
    assert drift < 1e-8, drift
    # walls stay exactly at zero
    assert float(jnp.max(jnp.abs(out.u[:, 0, :]))) == 0.0
    assert float(jnp.max(jnp.abs(out.u[:, -1, :]))) == 0.0


def test_channel_spinup_toward_poiseuille():
    sim = Simulation.from_case(load_case(Ini(text=INI_TEXT)))
    nx, ny, nz = sim.grid.shape
    y = sim.grid.y.nodes
    state = State(u=jnp.zeros((nx, ny, nz)), v=jnp.zeros((nx, ny, nz)),
                  w=jnp.zeros((nx, ny, nz)), s=jnp.zeros((1, nx, ny, nz)))
    dt = 2e-3
    step = jax.jit(lambda st: dyn.rk_step(sim.P, st, dt)[0])
    for _ in range(300):
        state = step(state)
    # monotone spin-up: centerline velocity grows toward u_max = 1
    uc = float(state.u[0, ny // 2, 0])
    assert 0.3 < uc <= 1.0, uc
