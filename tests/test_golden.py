"""Self-golden regression: a fixed deterministic case must reproduce the
recorded f64 statistics exactly (to tight tolerance) across refactors.
Generated 2026-08-17 (round 1) on the CPU float64 path; regenerated
2026-08-19 (round 3) after the reference-exact factorized elliptic swap
(validated digit-exact against the reference's own dns.out on Case01).
Any legitimate numerics change must regenerate these values
deliberately."""
import numpy as np
import jax.numpy as jnp

from tlab_tpu.config import load_case, Ini
from tlab_tpu.dycore import incompressible as dyn
from tlab_tpu.runtime import Simulation
from tlab_tpu.tools.initialize import initial_state

INI = """
[Main]
Type=temporal
Equations=incompressible
SpaceOrder=CompactJacobian6
TimeOrder=RungeKuttaExplicit3
TimeCFL=0.8
[Control]
ScalLimit=no
[Parameters]
Reynolds=300
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
NormalizeK=0.0001
ProfileIniK=GaussianSurface
ThickIniK=0.15
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

GOLDEN = {
    'u_mean': -2.55902874199718e-10, 'u_var': 0.20132193572283633,
    'v_var': 3.376000578246628e-05, 's_mean': 2.8655147839298927e-13,
    'u_probe': -0.0189268607193951, 'v_probe': 0.004875546004178572,
    's_probe': -0.49635871276097443,
}


def test_golden_shear_layer():
    sim = Simulation.from_case(load_case(Ini(text=INI)))
    st = initial_state(sim, seed=12345)
    for _ in range(20):
        st, _ = dyn.rk_step(sim.P, st, 2e-3)
    u = np.asarray(st.u)
    v = np.asarray(st.v)
    s = np.asarray(st.s[0])
    got = {
        'u_mean': float(u.mean()), 'u_var': float(u.var()),
        'v_var': float(v.var()), 's_mean': float(s.mean()),
        'u_probe': float(u[7, 16, 3]), 'v_probe': float(v[20, 8, 11]),
        's_probe': float(s[3, 25, 7]),
    }
    for k, ref in GOLDEN.items():
        scale = max(abs(ref), 1e-8)
        assert abs(got[k] - ref) / scale < 1e-9, (k, got[k], ref)
