"""Direct-forcing IBM + particle I/O round-trips."""
import numpy as np
import jax
import jax.numpy as jnp

from tlab_tpu import ibm as ibmmod
from tlab_tpu.config import load_case, Ini
from tlab_tpu.dycore import incompressible as dyn
from tlab_tpu.dycore.state import State
from tlab_tpu.runtime import Simulation
from tests.test_channel import INI_TEXT


def test_ibm_solid_stays_zero_and_flow_deflects():
    sim = Simulation.from_case(load_case(Ini(text=INI_TEXT)))
    nx, ny, nz = sim.grid.shape
    eps = ibmmod.geometry_box(sim.grid, nx // 4, nx // 2, 0, ny // 3, 0, nz)
    sim.P["ibm"] = ibmmod.build_ibm(eps, dtype=jnp.float64)
    y = sim.grid.y.nodes
    u0 = 0.5 * np.ones((nx, ny, nz)) * (y[None, :, None] * (1 - y[None, :, None]) * 4)
    state = State(u=jnp.asarray(u0), v=jnp.zeros((nx, ny, nz)),
                  w=jnp.zeros((nx, ny, nz)), s=jnp.zeros((1, nx, ny, nz)))
    step = jax.jit(lambda st: dyn.rk_step(sim.P, st, 1e-3)[0])
    for _ in range(20):
        state = step(state)
    solid = np.asarray(eps) > 0.5
    assert float(jnp.max(jnp.abs(jnp.asarray(state.u)[solid]))) == 0.0
    assert np.isfinite(np.asarray(state.u)).all()
    # flow deflects around the obstacle: vertical velocity develops upstream
    assert float(jnp.max(jnp.abs(state.v))) > 1e-6


def test_hill_geometry():
    sim = Simulation.from_case(load_case(Ini(text=INI_TEXT)))
    eps = ibmmod.geometry_hill(sim.grid, height=0.2, width=0.3, center=1.0)
    assert eps.max() == 1.0
    nx, ny, nz = sim.grid.shape
    ic = np.argmin(np.abs(sim.grid.x.nodes - 1.0))
    assert eps[ic, 0, 0] == 1.0           # solid at the hill base
    assert eps[ic, -1, 0] == 0.0          # fluid above


def test_particle_io_roundtrip(tmp_path):
    from tlab_tpu.particles import core as pc
    from tlab_tpu.particles import io as pio
    from tlab_tpu.grid import uniform_grid
    grid = uniform_grid(16, 17, 8, 1.0, 1.0, 1.0)
    ps = pc.init_particles(grid, 64, seed=2)
    path = str(tmp_path / "part.5")
    pio.write_particles(path, ps, itime=5)
    back, it = pio.read_particles(path)
    assert it == 5
    assert np.array_equal(np.asarray(back.x), np.asarray(ps.x))
    assert np.array_equal(np.asarray(back.tags), np.asarray(ps.tags))


def test_trajectories(tmp_path):
    from tlab_tpu.particles import core as pc
    from tlab_tpu.particles import io as pio
    from tlab_tpu.grid import uniform_grid
    grid = uniform_grid(16, 17, 8, 1.0, 1.0, 1.0)
    ps = pc.init_particles(grid, 32, seed=2)
    acc = pio.TrajectoryAccumulator(tag_ids=np.arange(4))
    for it in range(3):
        acc.accumulate(it, it * 0.1, ps)
    acc.flush(str(tmp_path))
    import glob
    files = glob.glob(str(tmp_path / "trajectories.*.npz"))
    assert len(files) == 1
    d = np.load(files[0])
    assert d["x"].shape == (3, 4, 3)


def test_spline_fill_cubic_exact():
    """Filling a solid run inside a cubic field reproduces it exactly."""
    from tlab_tpu.grid import uniform_grid
    grid = uniform_grid(32, 8, 1, 1.0, 1.0, 1.0)
    eps = np.zeros(grid.shape)
    eps[10:15, :, :] = 1.0                   # solid run along x
    fills = ibmmod.build_ibm_spline(eps, grid)
    x = grid.x.nodes[:, None, None]
    u = jnp.asarray((0.3 + 2 * x - x ** 2 + 0.5 * x ** 3)
                    * np.ones(grid.shape))
    u_broken = jnp.where(jnp.asarray(eps) > 0.5, 99.0, u)   # garbage in solid
    filled = ibmmod.apply_spline_fill(u_broken, fills["x"], 0)
    assert float(jnp.max(jnp.abs(filled - u))) < 1e-12


def test_ibm_spline_step_stable():
    sim = Simulation.from_case(load_case(Ini(text=INI_TEXT)))
    nx, ny, nz = sim.grid.shape
    eps = ibmmod.geometry_box(sim.grid, nx // 4, nx // 2, 0, ny // 3, 0, nz)
    ib = ibmmod.build_ibm(eps, dtype=jnp.float64)
    ib["fills"] = ibmmod.build_ibm_spline(eps, sim.grid, dtype=jnp.float64)
    sim.P["ibm"] = ib
    y = sim.grid.y.nodes
    u0 = 0.5 * np.ones((nx, ny, nz)) * (y[None, :, None] * (1 - y[None, :, None]) * 4)
    state = State(u=jnp.asarray(u0), v=jnp.zeros((nx, ny, nz)),
                  w=jnp.zeros((nx, ny, nz)), s=jnp.zeros((1, nx, ny, nz)))
    step = jax.jit(lambda st: dyn.rk_step(sim.P, st, 1e-3)[0])
    for _ in range(20):
        state = step(state)
    solid = np.asarray(eps) > 0.5
    assert float(jnp.max(jnp.abs(jnp.asarray(state.u)[solid]))) == 0.0
    assert np.isfinite(np.asarray(state.u)).all()


def test_valley_geometry():
    from tlab_tpu.grid import uniform_grid
    from tlab_tpu import ibm as ibmmod
    grid = uniform_grid(32, 33, 8, 2 * np.pi, 1.0, 1.0)
    eps = ibmmod.geometry_valley(grid, height_pts=8, slope=1)
    # tallest at x=0 (cos=1 -> height 8), zero at x=pi
    assert eps[0, :8, 0].all() and not eps[0, 8:, 0].any()
    assert not eps[16, :, 0].any()
    # z-invariant
    assert np.array_equal(eps[:, :, 0], eps[:, :, -1])


def test_spline_fill_wall_anchor_semi_immersed():
    """Semi-immersed solid on the bottom wall of a non-periodic axis
    (reference ibm_spline.f90 case 3): the interpolant is anchored at the
    wall with the prescribed value, so the fill honors no-slip instead of
    extrapolating from above-only support."""
    import jax.numpy as jnp
    n = 32
    nodes = np.linspace(0.0, 1.0, n)
    eps = np.zeros((4, n, 1))
    eps[:, :5, :] = 1.0                     # solid touching the wall
    idx, w, const = ibmmod.build_spline_fill(eps, 1, nodes, periodic=False,
                                          wall_values=(0.0, 0.0))
    # a linear field u = y through the anchor (0 at y=0): the fill on the
    # solid run must reproduce y exactly (cubic exact for linear + anchor)
    u = jnp.asarray(np.broadcast_to(nodes[None, :, None], eps.shape).copy())
    fill = {"idx": jnp.asarray(idx), "w": jnp.asarray(w),
            "const": jnp.asarray(const), "solid": jnp.asarray(eps > 0.5)}
    filled = np.asarray(ibmmod.apply_spline_fill(u, fill, 1))
    assert np.max(np.abs(filled[:, :5, :] - nodes[None, :5, None])) < 1e-12
    # nonzero wall value enters through const
    _, _, const2 = ibmmod.build_spline_fill(eps, 1, nodes, periodic=False,
                                         wall_values=(0.7, 0.0))
    assert np.abs(const2[:, :5, :]).max() > 0.0


def test_spline_fill_periodic_wrap():
    """Solid run touching the edge of a PERIODIC axis takes support from
    the opposite end with wrapped coordinates (reference cases 2/5)."""
    import jax.numpy as jnp
    n = 32
    lx = 2.0
    nodes = np.arange(n) * (lx / n)
    eps = np.zeros((1, 1, n))
    eps[..., :3] = 1.0                       # solid at the k=0 edge
    idx, w, const = ibmmod.build_spline_fill(eps, 2, nodes, periodic=True,
                                          scale=lx)
    # periodic smooth field: fill must be accurate across the wrap
    u = np.cos(2 * np.pi * nodes / lx)[None, None, :]
    fill = {"idx": jnp.asarray(idx), "w": jnp.asarray(w),
            "const": jnp.asarray(const), "solid": jnp.asarray(eps > 0.5)}
    filled = np.asarray(ibmmod.apply_spline_fill(jnp.asarray(u), fill, 2))
    assert np.max(np.abs(filled[..., :3] - u[..., :3])) < 5e-3


def test_xbars_mirrored():
    from tlab_tpu.grid import uniform_grid
    grid = uniform_grid(8, 24, 16, 1.0, 1.0, 1.0)
    eps = ibmmod.geometry_xbars(grid, nbars=2, height=4, width=3,
                             mirrored=True)
    assert eps[:, :4].max() == 1.0
    assert eps[:, -4:].max() == 1.0          # mirrored on the upper wall
    assert eps[:, 8:16].max() == 0.0
