"""Internal gravity wave: dispersion-relation validation of the buoyancy
coupling (the physics analog of the reference's stratified test cases).

Linear stratification b_y = N^2 = 1; the standing mode (kx, ky) oscillates
at omega = N kx / sqrt(kx^2 + ky^2). Initialize the velocity eigenmode with
zero buoyancy perturbation and check the oscillation of v against the
analytic cosine.
"""
import numpy as np
import jax
import jax.numpy as jnp

from tlab_tpu.config import load_case, Ini
from tlab_tpu.dycore import incompressible as dyn
from tlab_tpu.dycore.state import State
from tlab_tpu.runtime import Simulation, grid_from_case

INI_TEXT = """
[Main]
Type=temporal
Equations=incompressible
SpaceOrder=CompactJacobian6
TimeOrder=RungeKuttaExplicit4
TimeCFL=1.0
[Control]
ScalLimit=no
[Parameters]
Reynolds=100000
Schmidt=1.0
Froude=1.0
[Grid]
Imax=32
Jmax=33
Kmax=1
XUniform=yes
YUniform=yes
ZUniform=yes
XPeriodic=yes
YPeriodic=no
ZPeriodic=no
[Scalar]
ProfileScalar1=Linear
DeltaScalar1=0.0
MeanScalar1=0.0
[BoundaryConditions]
VelocityJmin=freeslip
VelocityJmax=freeslip
Scalar1Jmin=neumann
Scalar1Jmax=neumann
[BodyForce]
Type=Linear
Vector=0.0,1.0,0.0
Parameters=1.0
[IniGridOx]
periodic=yes
segments=1
points_1=33
scales_1=6.283185307179586
opts_1=uniform
[IniGridOy]
periodic=no
segments=1
points_1=33
scales_1=3.141592653589793
opts_1=uniform
[IniGridOz]
periodic=no
segments=1
points_1=1
scales_1=1.0
opts_1=uniform
"""


def test_internal_wave_frequency():
    case = load_case(Ini(text=INI_TEXT))
    sim = Simulation.from_case(case)
    nx, ny, nz = sim.grid.shape
    X = sim.grid.x.nodes[:, None, None]
    Y = sim.grid.y.nodes[None, :, None]
    kx, ky = 1.0, 1.0
    A = 1e-4
    v0 = A * np.cos(kx * X) * np.sin(ky * Y) * np.ones((nx, ny, nz))
    u0 = -A * (ky / kx) * np.sin(kx * X) * np.cos(ky * Y) * np.ones((nx, ny, nz))
    s0 = np.broadcast_to(Y, (nx, ny, nz))          # total scalar = background y
    state = State(u=jnp.asarray(u0), v=jnp.asarray(v0),
                  w=jnp.zeros((nx, ny, nz)),
                  s=jnp.asarray(s0)[None])

    omega = kx / np.sqrt(kx ** 2 + ky ** 2)        # N = 1
    dt = 0.02
    n_steps = 200
    step = jax.jit(lambda st: dyn.rk_step(sim.P, st, dt)[0])

    probe = [float(state.v[nx // 8, ny // 2, 0])]
    for _ in range(n_steps):
        state = step(state)
        probe.append(float(state.v[nx // 8, ny // 2, 0]))
    probe = np.asarray(probe) / probe[0]
    t = dt * np.arange(n_steps + 1)
    expected = np.cos(omega * t)
    err = np.max(np.abs(probe - expected))
    assert err < 0.02, err
