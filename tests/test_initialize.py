"""Initial-condition generators (reference iniflow/iniscal)."""
import numpy as np
import jax.numpy as jnp

from tlab_tpu.config import load_case, Ini
from tlab_tpu.runtime import Simulation

BROADBAND_CASE = """
[Main]
Type=temporal
Equations=incompressible
SpaceOrder=CompactJacobian6
TimeOrder=RungeKuttaExplicit3
[Control]
ScalLimit=no
[Parameters]
Reynolds=200
Schmidt=1.0
[Flow]
ProfileVelocityX=Tanh
ThickVelocityX=0.1
DeltaVelocityX=1.0
[Scalar]
ProfileScalar1=Tanh
ThickScalar1=0.1
DeltaScalar1=1.0
[BoundaryConditions]
VelocityJmin=freeslip
VelocityJmax=freeslip
Scalar1Jmin=neumann
Scalar1Jmax=neumann
[IniFields]
Velocity=VelocityBroadband
Scalar=LayerBroadband
ForceDilatation=yes
NormalizeK=0.001
ProfileIniK=GaussianSurface
ThickIniK=0.1
DeltaIniK=1.0
YCoorIniK=0.5
[IniGridOx]
periodic=yes
segments=1
points_1=33
scales_1=4.0
[IniGridOy]
periodic=no
segments=1
points_1=33
scales_1=2.0
opts_1=uniform
[IniGridOz]
periodic=yes
segments=1
points_1=16
scales_1=2.0
"""


def test_velocity_discrete_solenoidal():
    """Discrete-mode IC (reference VELOCITY_DISCRETE, flow_local.f90:177):
    the perturbation has the requested modal content, small compact-FD
    divergence, and works through initial_state with [Discrete]."""
    ini_txt = BROADBAND_CASE.replace("Velocity=VelocityBroadband",
                                     "Velocity=VelocityDiscrete")
    ini_txt += """
[Discrete]
Amplitude=0.02,0.01
ModeX=1,2
ModeZ=0,1
PhaseX=0.0,0.5
"""
    sim = Simulation.from_case(load_case(Ini(text=ini_txt)))
    from tlab_tpu.tools.initialize import velocity_discrete, initial_state
    from tlab_tpu.dycore import incompressible as dyn
    u, v, w = velocity_discrete(sim)
    nx, ny, nz = sim.grid.shape
    assert u.shape == (nx, ny, nz)
    # modal content: v at mid-y has kx=1 and (kx=2,kz=1) energy only
    vh = np.fft.rfft2(np.asarray(v[:, ny // 2, :]).T).T
    mag = np.abs(vh)
    tot = mag.sum()
    assert (mag[1, 0] + mag[2, 1] + mag[2, -1]) / tot > 0.99
    # compact-FD divergence small relative to the gradient magnitude
    div = np.asarray(dyn.divergence(sim.P, u, v, w))
    gy = np.asarray(dyn._d1(sim.P, "y", 1, v))
    assert np.max(np.abs(div)) < 5e-2 * np.max(np.abs(gy))
    st = initial_state(sim, seed=0)
    assert np.isfinite(np.asarray(st.u)).all()


def test_potential_broadband_solenoidal():
    """u = curl(A) is divergence-free to operator accuracy without any
    projection (reference PERT_BROADBAND_POTENTIAL)."""
    ini_txt = BROADBAND_CASE.replace("Velocity=VelocityBroadband",
                                     "Velocity=PotentialBroadband")
    sim = Simulation.from_case(load_case(Ini(text=ini_txt)))
    from tlab_tpu.tools.initialize import (velocity_potential_broadband,
                                           inirand_fields)
    from tlab_tpu.dycore import incompressible as dyn
    flow_rand, _ = inirand_fields(sim, seed=2)
    u, v, w = velocity_potential_broadband(sim, flow_rand)
    div = np.asarray(dyn.divergence(sim.P, u, v, w))
    grad = max(np.max(np.abs(np.asarray(dyn._d1(sim.P, a, i, f))))
               for a, i, f in (("x", 0, u), ("y", 1, v), ("z", 2, w)))
    assert np.max(np.abs(div)) < 2e-2 * grad
    # normalized TKE matches NormalizeK at the peak
    tke = 0.5 * (np.asarray(u)**2 + np.asarray(v)**2
                 + np.asarray(w)**2).mean(axis=(0, 2))
    assert abs(tke.max() - 0.001) / 0.001 < 0.05
