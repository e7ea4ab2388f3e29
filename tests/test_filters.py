"""Filter validation: DC preservation, high-wavenumber damping, polynomial
exactness (port of the reference's valid/filters intent)."""
import numpy as np
import pytest

from tlab_tpu.fdm import filters


def gain_periodic(F, k, n):
    x = np.arange(n) * (2 * np.pi / n)
    u = np.cos(k * x)
    uf = F @ u
    return np.dot(uf, u) / np.dot(u, u)


@pytest.mark.parametrize("alpha", [0.0, 0.3, 0.45])
def test_compact4_periodic_transfer(alpha):
    n = 64
    nodes = np.arange(n) * (2 * np.pi / n)
    F = filters.compact4_matrix(nodes, alpha, periodic=True)
    assert abs(gain_periodic(F, 1, n) - 1.0) < 1e-3          # DC-ish preserved
    g_nyq = gain_periodic(F, n // 2, n)
    assert abs(g_nyq) < 1e-10                                 # Nyquist killed
    # analytic transfer function of Lele C.2.4
    a = (5 + 6 * alpha) / 8
    b = (1 + 2 * alpha) / 2
    c = (2 * alpha - 1) / 8
    for k in (4, 11, 23):
        w = 2 * np.pi * k / n
        g_exact = (a + b * np.cos(w) + c * np.cos(2 * w)) / (1 + 2 * alpha * np.cos(w))
        assert abs(gain_periodic(F, k, n) - g_exact) < 1e-10


def test_compact4_bounded_polynomial_exact():
    n = 48
    nodes = np.linspace(0.0, 1.0, n) ** 1.2       # nonuniform
    F = filters.compact4_matrix(nodes, 0.45, periodic=False)
    for m in range(4):
        p = nodes ** m
        assert np.max(np.abs(F @ p - p)) < 1e-10, m


def test_explicit_filters_conserve_constants():
    n = 40
    nodes = np.linspace(0, 1, n)
    for F in (filters.explicit6_matrix(n, False),
              filters.explicit6_matrix(n, True),
              filters.explicit4_matrix(nodes, False),
              filters.tophat_matrix(nodes, 2, False)):
        ones = np.ones(n)
        assert np.max(np.abs(F @ ones - ones)) < 1e-12


def test_explicit6_damps_nyquist():
    n = 64
    F = filters.explicit6_matrix(n, True)
    x = np.arange(n)
    u = (-1.0) ** x                         # Nyquist mode
    assert np.max(np.abs(F @ u)) < 1e-12


def test_tophat_smooths():
    n = 64
    nodes = np.arange(n) / n
    F = filters.tophat_matrix(nodes, 4, True)
    rng = np.random.default_rng(0)
    u = rng.standard_normal(n)
    assert np.var(F @ u) < np.var(u)


def test_dealiasing_runs_and_stays_close():
    """Burgers with compact dealiasing stays close to the unfiltered result
    on a well-resolved field."""
    import jax, jax.numpy as jnp
    from tlab_tpu.config import load_case, Ini
    from tlab_tpu.runtime import Simulation
    from tlab_tpu.tools.initialize import initial_state
    from tlab_tpu.dycore import incompressible as dyn
    import os
    ini_path = os.path.join(os.path.dirname(__file__), "data",
                            "case01_small.ini")
    text = open(ini_path).read() + "\n[Dealiasing]\nType=compact\nParameters=0.49\n"
    sim = Simulation.from_case(load_case(Ini(text=text)))
    assert "dealias" in sim.P and sim.P["dealias"]["x"] is not None
    state = initial_state(sim, seed=7)
    step = jax.jit(lambda st: dyn.rk_step(sim.P, st, 5e-3)[0])
    out = step(state)
    assert bool(jnp.isfinite(out.u).all())

    sim0 = Simulation.from_case(load_case(ini_path))
    out0 = jax.jit(lambda st: dyn.rk_step(sim0.P, st, 5e-3)[0])(state)
    diff = float(jnp.max(jnp.abs(out.u - out0.u)))
    assert 0 < diff < 5e-3, diff


def test_adm_filter_properties():
    from tlab_tpu.ops.filter import adm_matrix
    n = 64
    nodes = np.arange(n) / n
    F = filters.tophat_matrix(nodes, 2, True)
    A = adm_matrix(nodes, True)
    ones = np.ones(n)
    assert np.max(np.abs(A @ ones - ones)) < 1e-12
    # ADM restores more of a smooth mode than plain top-hat (deconvolution)
    x = np.arange(n) * 2 * np.pi / n
    u = np.cos(5 * x)
    g_top = np.dot(F @ u, u) / np.dot(u, u)
    g_adm = np.dot(A @ u, u) / np.dot(u, u)
    assert g_top < g_adm <= 1.0 + 1e-12


def test_helmholtz_filter_smooths():
    import jax.numpy as jnp
    from tlab_tpu.config import load_case
    from tlab_tpu.runtime import Simulation
    from tlab_tpu.ops.filter import build_helmholtz_filter
    import os
    ini = os.path.join(os.path.dirname(__file__), "data", "case01_small.ini")
    sim = Simulation.from_case(load_case(ini))
    nx, ny, nz = sim.grid.shape
    h = sim.grid.x.nodes[1] - sim.grid.x.nodes[0]
    filt = build_helmholtz_filter(sim.P["ell"], width=4 * h)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((nx, ny, nz)))
    uf = filt(u)
    assert np.isfinite(np.asarray(uf)).all()
    assert float(jnp.var(uf)) < 0.7 * float(jnp.var(u))
    # long-wave content preserved
    X = sim.grid.x.nodes[:, None, None]
    k0 = 2 * np.pi / sim.grid.x.scale
    m = jnp.asarray(np.sin(k0 * X) * np.ones((nx, ny, nz)))
    mf = filt(m)
    assert float(jnp.max(jnp.abs(mf - m))) < 0.05


def test_spectral_filters():
    """Circulant spectral filters: band keeps exactly the in-band modes;
    erf rolls off around the cutoff (reference spectral band/erf)."""
    from tlab_tpu.fdm.filters import spectral_matrix
    n = 64
    x = np.arange(n) * 2 * np.pi / n
    # band-pass in grid units: modes 3..6 (k = m*2pi/n)
    lo, hi = 2.5 * 2 * np.pi / n, 6.5 * 2 * np.pi / n
    M = spectral_matrix(n, "band", (lo, hi))
    f = np.cos(2 * x) + np.sin(4 * x) + np.cos(10 * x)
    g = M @ f
    gh = np.abs(np.fft.rfft(g)) / n * 2
    assert gh[4] > 0.99 and gh[2] < 1e-12 and gh[10] < 1e-12

    Me = spectral_matrix(n, "erf", (8 * 2 * np.pi / n, 2 * 2 * np.pi / n))
    ge = np.abs(np.fft.rfft(Me @ f)) / n * 2
    assert ge[2] > 0.99          # well below cutoff: untouched
    assert ge[10] < 0.35         # above cutoff: strongly damped
