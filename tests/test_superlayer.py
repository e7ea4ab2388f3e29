"""Superlayer interface extraction: analytic fields with known crossing
heights, plus the offline tool end-to-end."""
import os

import numpy as np
import jax.numpy as jnp

from tlab_tpu.stats import superlayer as sl


def test_boundary_heights_analytic():
    """Indicator a(y) = exp(-((y-yc)/d)^2) modulated in x: the upper/lower
    crossings of a = amin are at yc +/- d sqrt(ln(A/amin)) and linear
    interpolation recovers them to grid accuracy."""
    nx, ny, nz = 8, 129, 4
    y = np.linspace(0.0, 2.0, ny)
    x_mod = 1.0 + 0.5 * np.sin(2 * np.pi * np.arange(nx) / nx)
    yc, d = 1.0, 0.25
    a = x_mod[:, None, None] * np.exp(-((y[None, :, None] - yc) / d) ** 2) \
        * np.ones((1, 1, nz))
    amin = 0.3
    y_up = np.asarray(sl.upper_boundary(jnp.asarray(y), jnp.asarray(a), amin))
    y_lo = np.asarray(sl.lower_boundary(jnp.asarray(y), jnp.asarray(a), amin))
    h = d * np.sqrt(np.log(x_mod / amin))
    for i in range(nx):
        assert abs(y_up[i, 0] - (yc + h[i])) < 2e-4, i
        assert abs(y_lo[i, 0] - (yc - h[i])) < 2e-4, i

    # never-exceeded column: upper -> y[0], lower -> y[-1]
    a0 = np.zeros((2, ny, 2))
    assert np.all(np.asarray(sl.upper_boundary(jnp.asarray(y),
                                               jnp.asarray(a0), 0.5)) == y[0])
    assert np.all(np.asarray(sl.lower_boundary(jnp.asarray(y),
                                               jnp.asarray(a0), 0.5)) == y[-1])


def test_sample_at_surface():
    ny = 65
    y = np.linspace(0.0, 1.0, ny)
    f = np.broadcast_to((3.0 * y + 1.0)[None, :, None], (4, ny, 3)).copy()
    ysl = jnp.full((4, 3), 0.4375)
    got = np.asarray(sl.sample_at_surface(jnp.asarray(f), jnp.asarray(y),
                                          ysl, offsets=(0.0, 0.1)))
    assert abs(got[0, 0, 0] - (3 * 0.4375 + 1)) < 1e-12
    assert abs(got[1, 0, 0] - (3 * 0.5375 + 1)) < 1e-9


def test_superlayer_tool(tmp_path):
    from tests.test_stats import MINI_CASE
    from tlab_tpu.config import load_case, Ini
    from tlab_tpu.runtime import Simulation
    from tlab_tpu.dycore.state import State
    from tlab_tpu.io import fields_io
    from tlab_tpu.tools import postprocess as pp

    sim = Simulation.from_case(load_case(Ini(text=MINI_CASE)))
    nx, ny, nz = sim.grid.shape
    y = sim.grid.y.nodes
    # shear layer centered mid-channel -> vorticity concentrated there
    u = np.broadcast_to(np.tanh((y - 0.5) / 0.1)[None, :, None],
                        (nx, ny, nz)).copy()
    st = State(u=jnp.asarray(u), v=jnp.zeros((nx, ny, nz)),
               w=jnp.zeros((nx, ny, nz)),
               s=jnp.zeros((1, nx, ny, nz)))
    fields_io.write_state(os.path.join(tmp_path, "flow"),
                          os.path.join(tmp_path, "scal"), 7, st, 0.0, 1e-3)
    pp.run_superlayer(sim, str(tmp_path), [7], threshold=0.05)
    dat = np.load(os.path.join(tmp_path, "sl7.npz"))
    # interface brackets the vorticity layer around y=0.5
    assert 0.5 < dat["up_mean"] < 0.95
    assert 0.05 < dat["lo_mean"] < 0.5
    assert dat["up_pdf"].sum() > 0.99
    assert dat["up_Enstrophy"].shape == (nx, nz)


def test_surface_jpdf():
    from tlab_tpu.stats import superlayer as sl2
    rng = np.random.default_rng(0)
    a = rng.standard_normal((16, 8))
    b = 2 * a + 0.01 * rng.standard_normal((16, 8))   # strongly correlated
    counts, ea, eb = sl2.surface_jpdf(a, b, nbins=8)
    assert abs(counts.sum() - 1.0) < 1e-12
    # correlation shows as diagonal mass concentration
    diag = sum(counts[i, i] for i in range(8))
    assert diag > 0.5


def test_sample_along_normals():
    """Normal-direction sampling (reference sl_normal_sample.f90): on a
    tilted planar interface inside a linear field, samples at distance d
    along the true normal recover f(surface) + d * (grad f . n)."""
    import jax.numpy as jnp
    from tlab_tpu.grid import uniform_grid
    from tlab_tpu.stats import superlayer as sl
    grid = uniform_grid(32, 64, 16, 2.0, 1.0, 1.0)
    nx, ny, nz = grid.shape
    X = grid.x.nodes[:, None]
    slope = 0.2
    ysl = jnp.asarray(0.4 + slope * X * np.ones((nx, nz)))
    # field f = y (linear): sample at distance d along n gives
    # ysl + d * n_y with n_y = 1/sqrt(1+slope^2)
    f = jnp.asarray(np.broadcast_to(grid.y.nodes[None, :, None],
                                    (nx, ny, nz)).copy())
    d = 0.1
    vals = sl.sample_along_normals(grid, f, ysl, [0.0, d])
    ny_comp = 1.0 / np.sqrt(1.0 + slope ** 2)
    inner = slice(2, nx - 2)
    err0 = np.abs(np.asarray(vals[0])[inner] - np.asarray(ysl)[inner])
    err1 = np.abs(np.asarray(vals[1])[inner]
                  - (np.asarray(ysl)[inner] + d * ny_comp))
    assert err0.max() < 1e-6
    assert err1.max() < 1e-3
    # normals are unit vectors
    n = np.asarray(sl.surface_normals(grid, ysl))
    assert np.allclose(np.linalg.norm(n, axis=-1), 1.0)
