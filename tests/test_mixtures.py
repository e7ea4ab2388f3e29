"""Multi-species mixture thermodynamics (physics/mixtures.py): the
reference's combustion MIXT_TYPE families (thermodynamics.f90:34-48,
217-430) and the CHEMKIN NASA-7 reader (THERMO_READ_CHEMKIN)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tlab_tpu.physics import mixtures as mx


def _rand_Y(nsp, shape, rng):
    Y = rng.random((nsp,) + shape)
    return Y / Y.sum(axis=0)


def test_bs_mixture_definition():
    t = mx.build_mixture("bs", nondimensional=False)
    assert t.species == ("CH4", "O2", "H2O", "CO2", "N2")
    assert t.ncp == 2
    # reference species is O2 (index 1): R = 8314/32
    assert abs(t.rref - 8314.0 / 32.0) < 1e-10
    # gamma0 of O2 at 298 K with the linear-cp fit: close to 1.39
    assert 1.35 < t.gama0 < 1.42


@pytest.mark.parametrize("name", ["bs", "peters1991", "onestep",
                                  "unidecomp"])
def test_enthalpy_consistency(name):
    """dh/dT == cp (finite difference) and h(T_data_ref) == formation
    enthalpy for every species, dimensional units."""
    t = mx.build_mixture(name, nondimensional=False)
    T = np.linspace(250.0, 2000.0, 8)
    h = np.asarray(mx.h_species(t, T))
    cp = np.asarray(mx.cp_species(t, T))
    dT = 1e-3
    dh = (np.asarray(mx.h_species(t, T + dT))
          - np.asarray(mx.h_species(t, T - dT))) / (2 * dT)
    assert np.allclose(dh, cp, rtol=1e-7)
    # formation enthalpy anchored at the data reference temperature
    h298 = np.asarray(mx.h_species(t, np.array([298.0])))[:, 0]
    href = np.array([mx._COMBUSTION_SPECIES[s][1]
                     / mx._COMBUSTION_SPECIES[s][0] for s in t.species])
    assert np.allclose(h298, href, rtol=1e-10, atol=1e-8)


def test_product_formation_enthalpy():
    t = mx.build_mixture("onestep", nondimensional=False)
    h298 = np.asarray(mx.h_species(t, np.array([298.0])))[:, 0]
    assert abs(h298[2] - (-86.71502e6 / 32.0)) < 1.0   # Product
    assert abs(h298[0]) < 1e-6                          # Reactant


def test_nondimensionalization_invariance():
    """Nondimensional h/cp equal dimensional ones scaled by cpref (and
    cpref*TREF): the physics is unit-independent."""
    td = mx.build_mixture("bs", nondimensional=False)
    tn = mx.build_mixture("bs", nondimensional=True)
    rng = np.random.default_rng(0)
    T = rng.uniform(260.0, 1800.0, (4, 3))
    Y = _rand_Y(td.nsp, T.shape, rng)
    hd = np.asarray(mx.h_mixture(td, T, Y))
    hn = np.asarray(mx.h_mixture(tn, T / mx.TREF, Y))
    assert np.allclose(hn, hd / (td.cpref * mx.TREF), rtol=1e-12)
    cpd = np.asarray(mx.cp_mixture(td, T, Y))
    cpn = np.asarray(mx.cp_mixture(tn, T / mx.TREF, Y))
    assert np.allclose(cpn, cpd / td.cpref, rtol=1e-12)
    # normalized gas constant of the reference species is 1
    assert abs(tn.R[1] - 1.0) < 1e-14


def test_temperature_inversion_roundtrip():
    t = mx.build_mixture("peters1991", nondimensional=True)
    rng = np.random.default_rng(1)
    T = jnp.asarray(rng.uniform(0.9, 6.0, (5, 4)))   # T/TREF
    Y = jnp.asarray(_rand_Y(t.nsp, (5, 4), rng))
    h = mx.h_mixture(t, T, Y)
    T2 = mx.temperature_from_enthalpy(t, h, Y, n_newton=8)
    assert np.allclose(np.asarray(T2), np.asarray(T), rtol=1e-10)


def test_gamma_and_gas_constant():
    t = mx.build_mixture("bs", nondimensional=False)
    # pure N2 at 300 K: gamma ~ 1.4, R = 8314/28
    Y = np.zeros((5, 1)); Y[4] = 1.0
    R = float(mx.gas_constant(t, jnp.asarray(Y))[0])
    assert abs(R - 8314.0 / 28.0) < 1e-10
    g = float(mx.gamma_mixture(t, jnp.asarray([300.0]), jnp.asarray(Y))[0])
    assert 1.38 < g < 1.42


CHEMKIN_SAMPLE = """THERMO
   200.000  1000.000  5000.000
O2                TPIS89O   2               G   200.000  5000.000 1000.000    1
 3.28253784E+00 1.48308754E-03-7.57966669E-07 2.09470555E-10-2.16717794E-14    2
-1.08845772E+03 5.45323129E+00 3.78245636E+00-2.99673416E-03 9.84730201E-06    3
-9.68129509E-09 3.24372837E-12-1.06394356E+03 3.65767573E+00                   4
CH4               L 8/88C   1H   4          G   200.000  3500.000 1000.000    1
 7.48514950E-02 1.33909467E-02-5.73285809E-06 1.22292535E-09-1.01815230E-13    2
-9.46834459E+03 1.84373180E+01 5.14987613E+00-1.36709788E-02 4.91800599E-05    3
-4.84743026E-08 1.66693956E-11-1.02466476E+04-4.64130376E+00                   4
END
"""


def test_chemkin_reader(tmp_path):
    """Standard GRI-Mech NASA-7 records parse: molar mass from the
    elemental composition columns, cp(298 K) near the tabulated values
    (O2: 29.4 J/mol/K, CH4: 35.7 J/mol/K)."""
    p = tmp_path / "therm.dat"
    p.write_text(CHEMKIN_SAMPLE)
    t = mx.read_chemkin(str(p), nondimensional=False)
    assert t.species == ("O2", "CH4")
    assert abs(t.W[0] - 2 * 15.999) < 1e-6
    assert abs(t.W[1] - (12.011 + 4 * 1.008)) < 1e-6
    cp = np.asarray(mx.cp_species(t, np.array([298.15])))[:, 0]
    assert abs(cp[0] * t.W[0] / 1000.0 - 29.38) < 0.2     # J/mol/K
    assert abs(cp[1] * t.W[1] / 1000.0 - 35.69) < 0.4
    # dh/dT == cp for the 5th-order polynomial too
    T = np.linspace(250.0, 900.0, 5)
    dT = 1e-3
    dh = (np.asarray(mx.h_species(t, T + dT))
          - np.asarray(mx.h_species(t, T - dT))) / (2 * dT)
    assert np.allclose(dh, np.asarray(mx.cp_species(t, T)), rtol=1e-6)


def test_unknown_mixture_raises():
    with pytest.raises(ValueError):
        mx.build_mixture("nosuch")


# ---------------------------------------------------------------------------
# Compressible dycore closure (dycore/compressible.py mixture_thermal):
# the reference couples the caloric table to the conservative state via
# THERMO_CALORIC_TEMPERATURE + THERMO_THERMAL_PRESSURE.
# ---------------------------------------------------------------------------

def _comp_setup(**kw):
    from tests.test_compressible import _setup
    return _setup(**kw)


def test_dycore_roundtrip_mixture():
    """from_primitive(mix) -> primitive(mix) recovers (T, p) to Newton
    tolerance for a spatially varying multi-species state."""
    from tlab_tpu.dycore import compressible as comp
    import jax.numpy as jnp
    mix = mx.build_mixture("onestep")
    grid, nsp, P = _comp_setup(nx=16, ny=8, schmidt=(1.0,) * 3)
    nx, ny, nz = grid.shape
    rng = np.random.default_rng(3)
    shape = (nx, ny, nz)
    T = jnp.asarray(rng.uniform(0.9, 3.0, shape))
    rho = jnp.asarray(rng.uniform(0.5, 1.5, shape))
    u = jnp.asarray(rng.normal(size=shape))
    Y = _rand_Y(4, shape, rng)
    s = jnp.asarray(Y[:3])
    U = comp.from_primitive(rho, u, 0.0 * u, 0.0 * u, T, 1.4, 0.5,
                            s=s, mix=mix)
    _, _, _, T2, p2 = comp.primitive(P, U, 1.4, 0.5, mix=mix)
    assert np.allclose(np.asarray(T2), np.asarray(T), rtol=1e-9)
    R = mx.gas_constant(mix, jnp.asarray(Y))
    p_exact = rho * R * T / (mix.gama0 * 0.25)
    assert np.allclose(np.asarray(p2), np.asarray(p_exact), rtol=1e-9)


def test_dycore_constant_cp_limit():
    """A constant-cp equal-W mixture (unidecomp) must reproduce the
    single-species ideal-gas closure exactly (gamma = gama0)."""
    from tlab_tpu.dycore import compressible as comp
    import jax.numpy as jnp
    mix = mx.build_mixture("unidecomp")
    grid, nsp, P = _comp_setup(nx=16, ny=8, schmidt=(1.0,))
    nx, ny, nz = grid.shape
    rng = np.random.default_rng(4)
    shape = (nx, ny, nz)
    T = jnp.asarray(rng.uniform(0.8, 2.0, shape))
    rho = jnp.asarray(rng.uniform(0.7, 1.3, shape))
    u = jnp.asarray(rng.normal(size=shape))
    s = jnp.asarray(rng.uniform(0.1, 0.9, (1,) + shape))
    g0, mach = mix.gama0, 0.3
    Umix = comp.from_primitive(rho, u, 0.0 * u, 0.0 * u, T, g0, mach,
                               s=s, mix=mix)
    Uid = comp.from_primitive(rho, u, 0.0 * u, 0.0 * u, T, g0, mach, s=s)
    # same internal energy field up to the (constant) formation offset;
    # T/p recovery agrees with the ideal-gas closure
    _, _, _, Tm, pm = comp.primitive(P, Umix, g0, mach, mix=mix)
    _, _, _, Ti, pi_ = comp.primitive(P, Uid, g0, mach)
    assert np.allclose(np.asarray(Tm), np.asarray(Ti), rtol=1e-8)
    assert np.allclose(np.asarray(pm), np.asarray(pi_), rtol=1e-8)


def test_dycore_mixture_conservation():
    """Periodic inviscid box with species gradients: total mass, species
    mass, momentum, and total energy are conserved by the divergence-form
    fluxes (reference RHS_FLOW_EULER_DIVERGENCE property)."""
    import jax
    import jax.numpy as jnp
    from tlab_tpu.dycore import compressible as comp
    mix = mx.build_mixture("onestep")
    grid, nsp, P = _comp_setup(nx=32, ny=8, nz=1, reynolds=1e12,
                               schmidt=(1.0,) * 3)
    nx, ny, nz = grid.shape
    X = grid.x.nodes[:, None, None] * np.ones((nx, ny, nz))
    rho = jnp.asarray(1.0 + 0.1 * np.sin(X))
    u = jnp.asarray(0.2 * np.cos(X))
    T = jnp.asarray(1.0 + 0.05 * np.sin(2 * X))
    Y1 = 0.25 + 0.1 * np.cos(X)
    s = jnp.asarray(np.stack([Y1, 0.3 * np.ones_like(Y1),
                              0.2 * np.ones_like(Y1)]))
    U = comp.from_primitive(rho, u, 0.0 * u, 0.0 * u, T, 1.4, 0.4,
                            s=s, mix=mix)
    step = jax.jit(lambda U: comp.rk_step_compressible(
        P, U, 5e-4, 1.4, 0.4, 0.0, 1.0, mix=mix))
    tot0 = [float(jnp.sum(q)) for q in (U.rho, U.rhou, U.rhoE)]
    sp0 = float(jnp.sum(U.rhos))
    for _ in range(20):
        U = step(U)
    tot1 = [float(jnp.sum(q)) for q in (U.rho, U.rhou, U.rhoE)]
    sp1 = float(jnp.sum(U.rhos))
    for a, b in zip(tot0, tot1):
        assert abs(b - a) <= 1e-9 * max(1.0, abs(a))
    assert abs(sp1 - sp0) <= 1e-9 * abs(sp0)
    assert bool(jnp.all(jnp.isfinite(U.rhoE)))


def test_dycore_mixture_sound_speed():
    """acoustic_cfl_max follows the reference TIME_COURANT: c^2 =
    gama0 p/rho with the CONSTANT gama0 and the mixture pressure
    p = rho R(Y) T/(gama0 M^2) (time.f90:429) -- for a quiescent uniform
    pure-N2 state the CFL bound is sqrt(R_N2 T)/M (1/dx + 1/dy)."""
    import jax.numpy as jnp
    from tlab_tpu.dycore import compressible as comp
    mix = mx.build_mixture("bs")
    grid, nsp, P = _comp_setup(nx=16, ny=8, schmidt=(1.0,) * 4)
    nx, ny, nz = grid.shape
    one = jnp.ones((nx, ny, nz))
    s = jnp.zeros((4, nx, ny, nz))          # Y = pure N2 (balance)
    mach = 0.5
    U = comp.from_primitive(one, 0.0 * one, 0.0 * one, 0.0 * one,
                            one, 1.4, mach, s=s, mix=mix)
    got = float(comp.acoustic_cfl_max(P, U, 1.4, mach, mix=mix))
    YN2 = np.zeros((5, 1)); YN2[4] = 1.0
    R = float(mx.gas_constant(mix, jnp.asarray(YN2))[0])
    c = np.sqrt(R) / mach                   # sqrt(gama0 p/rho), T = 1
    dx = float(grid.x.nodes[1] - grid.x.nodes[0])
    dy = 1.0 / 8
    expect = c * (1 / dx + 1 / dy)
    assert abs(got - expect) / expect < 1e-8
