"""Caloric/thermal/transport EOS (reference thermo_caloric/thermal/
viscosity)."""
import numpy as np
import jax.numpy as jnp

from tlab_tpu.physics import eos


def test_eos_roundtrips():
    gas = eos.GasParams(gamma=1.4, mach=0.5)
    T = jnp.asarray([0.8, 1.0, 1.3])
    rho = jnp.asarray([0.9, 1.0, 1.1])
    assert np.allclose(eos.temperature_from_e(gas, eos.energy_from_t(gas, T)),
                       T)
    p = eos.pressure(gas, rho, T)
    assert np.allclose(eos.density(gas, p, T), rho)
    assert np.allclose(eos.temperature_from_rho_p(gas, rho, p), T)
    # sound speed at T=1 equals 1/M
    assert abs(float(eos.sound_speed2(gas, jnp.asarray(1.0))) - 1/0.25) < 1e-12


def test_transport_laws():
    T = jnp.asarray([0.5, 1.0, 2.0])
    g_none = eos.GasParams(transport="none")
    g_pow = eos.GasParams(transport="powerlaw")
    g_suth = eos.GasParams(transport="sutherland")
    assert np.allclose(eos.viscosity(g_none, T), 1.0)
    assert np.allclose(eos.viscosity(g_pow, T), np.asarray(T) ** 0.7)
    mu_s = np.asarray(eos.viscosity(g_suth, T))
    assert abs(mu_s[1] - 1.0) < 1e-12        # normalized at T_ref
    assert mu_s[0] < 1.0 < mu_s[2]           # monotone increasing


def test_viscous_decay_powerlaw():
    """Compressible shear decay with mu(T)=T^0.7 at near-uniform T matches
    the constant-mu rate to O(Mach^2) (regression for the variable-mu
    plumbing)."""
    from tlab_tpu.constants import BC
    from tlab_tpu.dycore import compressible as comp
    from tlab_tpu.dycore.incompressible import WallBCs, build_device_plans
    from tlab_tpu.fdm.plan import build_fdm_plan
    from tlab_tpu.grid import uniform_grid
    from tlab_tpu.physics.params import NSParams

    grid = uniform_grid(32, 9, 8, 2 * np.pi, 1.0, 1.0,
                        periodic=(True, True, True))
    fdm = build_fdm_plan(grid)
    nsp = NSParams(reynolds=100.0, schmidt=())
    P = build_device_plans(fdm, nsp, WallBCs(s=()), dtype=jnp.float64,
                           with_elliptic=False)
    P["y_periodic"] = True
    gamma, mach = 1.4, 0.05
    gas = eos.GasParams(gamma=gamma, mach=mach, transport="powerlaw")
    nx, ny, nz = grid.shape
    x = grid.x.nodes[:, None, None]
    rho = jnp.ones((nx, ny, nz))
    v0 = 0.01 * np.sin(x) * np.ones((1, ny, nz))   # transverse: pure shear
    T0 = np.ones((nx, ny, nz))
    e0 = eos.energy_from_t(gas, jnp.asarray(T0))
    U = comp.CompState(rho=rho, rhou=jnp.zeros_like(rho),
                       rhov=jnp.asarray(v0),
                       rhow=jnp.zeros_like(rho),
                       rhoE=rho * e0 + 0.5 * jnp.asarray(v0) ** 2)
    dt = 2e-3
    nsteps = 100
    for _ in range(nsteps):
        U = comp.rk_step_compressible(P, U, dt, gamma, mach, nsp.visc, 0.7,
                                      gas=gas)
    amp = float(jnp.max(jnp.abs(U.rhov)))
    expect = 0.01 * np.exp(-nsp.visc * dt * nsteps)
    assert abs(amp - expect) / expect < 0.02
