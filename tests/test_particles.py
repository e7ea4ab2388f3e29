"""Lagrangian particle validation: interpolation exactness, advection
accuracy, scatter consistency, coupled stepping."""
import numpy as np
import jax
import jax.numpy as jnp

from tlab_tpu.dycore import incompressible as dyn
from tlab_tpu.dycore.state import State
from tlab_tpu.fdm.plan import build_fdm_plan
from tlab_tpu.grid import uniform_grid
from tlab_tpu.particles import core as pc
from tlab_tpu.particles.stepping import rk_step_with_particles
from tlab_tpu.physics.params import NSParams


def _grid(nx=32, ny=33, nz=16):
    return uniform_grid(nx, ny, nz, 2.0, 1.0, 1.5)


def test_trilinear_exact_on_linear_field():
    grid = _grid()
    locate = pc.make_locator(grid)
    X = grid.x.nodes[:, None, None]
    Y = grid.y.nodes[None, :, None]
    Z = grid.z.nodes[None, None, :]
    f = jnp.asarray(2.0 * X + 3.0 * Y - 1.5 * Z + 0.7 * np.ones(grid.shape))
    rng = np.random.default_rng(0)
    pos = jnp.asarray(np.stack([
        rng.uniform(0.1, 1.7, 500), rng.uniform(0.05, 0.95, 500),
        rng.uniform(0.1, 1.3, 500)], axis=1))
    vals = pc.interpolate_to_particles(f, locate(pos))
    exact = 2.0 * pos[:, 0] + 3.0 * pos[:, 1] - 1.5 * pos[:, 2] + 0.7
    assert float(jnp.max(jnp.abs(vals - exact))) < 1e-12


def test_scatter_conserves_total():
    grid = _grid()
    locate = pc.make_locator(grid)
    rng = np.random.default_rng(1)
    pos = jnp.asarray(np.stack([
        rng.uniform(0.1, 1.7, 200), rng.uniform(0.05, 0.95, 200),
        rng.uniform(0.1, 1.3, 200)], axis=1))
    vals = jnp.asarray(rng.standard_normal(200))
    fld = pc.particles_to_field(vals, locate(pos), grid.shape)
    assert abs(float(jnp.sum(fld)) - float(jnp.sum(vals))) < 1e-10


def test_tracer_uniform_advection():
    """Constant velocity: exact linear trajectories with periodic wrap."""
    grid = _grid()
    fdm = build_fdm_plan(grid)
    nsp = NSParams(reynolds=1e6, schmidt=())
    bcs = dyn.WallBCs.from_velocity_kind("freeslip", "freeslip", scalar_bcs=())
    P = dyn.build_device_plans(fdm, nsp, bcs, dtype=jnp.float64)
    locate = pc.make_locator(grid)
    nx, ny, nz = grid.shape
    u0 = 0.7
    state = State(u=jnp.full((nx, ny, nz), u0), v=jnp.zeros((nx, ny, nz)),
                  w=jnp.zeros((nx, ny, nz)), s=jnp.zeros((0, nx, ny, nz)))
    pstate = pc.init_particles(grid, 100, seed=3)
    x0 = np.asarray(pstate.x).copy()
    dt = 0.01
    props = pc.ParticleProps(type="tracer")
    step = jax.jit(lambda st, ps: rk_step_with_particles(
        P, grid, locate, props, st, ps, dt))
    for _ in range(20):
        state, pstate = step(state, pstate)
    expect_x = np.mod(x0[:, 0] + u0 * dt * 20, grid.x.scale)
    got_x = np.mod(np.asarray(pstate.x[:, 0]), grid.x.scale)
    diff = np.minimum(np.abs(got_x - expect_x),
                      grid.x.scale - np.abs(got_x - expect_x))
    assert np.max(diff) < 1e-8
    assert np.max(np.abs(np.asarray(pstate.x[:, 1]) - x0[:, 1])) < 1e-10


def test_inertia_relaxes_to_flow():
    """Heavy particle in uniform flow approaches the fluid velocity at the
    Stokes rate: v(t) = u (1 - e^{-t/St})."""
    grid = _grid()
    locate = pc.make_locator(grid)
    nx, ny, nz = grid.shape
    u0 = 1.0
    u = jnp.full((nx, ny, nz), u0)
    zeros = jnp.zeros((nx, ny, nz))
    props = pc.ParticleProps(type="inertia", stokes=0.5)
    pstate = pc.init_particles(grid, 10, seed=5)

    # manual RK4-5 on the particle only (flow frozen)
    from tlab_tpu.dycore.timemarch import RK4
    dt = 0.01
    n = 200
    hx = jnp.zeros_like(pstate.x)
    hv = jnp.zeros_like(pstate.v)
    for _ in range(n):
        hx = jnp.zeros_like(pstate.x)
        hv = jnp.zeros_like(pstate.v)
        for i, k in enumerate(RK4.kdt):
            dte = dt * k
            dpx, dpv = pc.particle_rhs(props, pstate, locate, u, zeros, zeros)
            hx = hx + dpx
            hv = hv + dpv
            pstate = pc.ParticleState(
                x=pc.wrap_positions(grid, pstate.x + dte * hx),
                v=pstate.v + dte * hv, props=pstate.props, tags=pstate.tags)
            if i < 4:
                hx = RK4.kco[i] * hx
                hv = RK4.kco[i] * hv
    t = dt * n
    expect = u0 * (1.0 - np.exp(-t / 0.5))
    got = float(jnp.mean(pstate.v[:, 0]))
    assert abs(got - expect) < 1e-6, (got, expect)


def test_dns_run_with_particles(tmp_path):
    """Particles ride the dns driver loop and checkpoint with restarts."""
    import os
    from tlab_tpu.config import load_case
    from tlab_tpu.runtime import Simulation
    from tlab_tpu.tools import dns as dns_tool
    from tlab_tpu.tools.initialize import initial_state
    ini = os.path.join(os.path.dirname(__file__), "data", "case01_small.ini")
    sim = Simulation.from_case(load_case(ini))
    state = initial_state(sim, seed=7)
    ps = pc.init_particles(sim.grid, 50, seed=1)
    run = dns_tool.run(sim, state, outdir=str(tmp_path), n_steps=5,
                       pstate=ps, particle_props=pc.ParticleProps("tracer"))
    assert run.pstate is not None
    x = np.asarray(run.pstate.x)
    assert np.isfinite(x).all()
    # particles moved
    assert np.max(np.abs(x - np.asarray(ps.x))) > 1e-6


def test_particle_pdfs():
    """Per-slab particle-property histograms: counts land in the right y
    slab and value bin."""
    from tlab_tpu.particles.io import particle_pdfs
    import jax.numpy as jnp
    from tlab_tpu.particles.core import ParticleState
    n = 200
    rng = np.random.default_rng(0)
    x = np.column_stack([rng.uniform(0, 1, n), rng.uniform(0, 1, n),
                         rng.uniform(0, 1, n)])
    props = np.where(x[:, 1:2] < 0.5, 0.25, 0.75)   # property tied to slab
    ps = ParticleState(x=jnp.asarray(x), v=jnp.zeros((n, 3)),
                       props=jnp.asarray(props), tags=jnp.arange(n))
    counts, edges = particle_pdfs(ps, 0, [0.0, 0.5, 1.0], 0.0, 1.0,
                                  nbins=4)
    assert counts.shape == (2, 4)
    assert counts[0, 1] == counts[0].sum() > 0      # lower slab: all 0.25
    assert counts[1, 3] == counts[1].sum() > 0      # upper slab: all 0.75


def test_assemble_trajectories(tmp_path):
    """Offline trajectory assembly across saved restarts follows a known
    drift."""
    import os
    from tlab_tpu.particles.io import (write_particles, read_particles,
                                       assemble_trajectories)
    from tlab_tpu.particles.core import ParticleState
    import jax.numpy as jnp
    n = 20
    rng = np.random.default_rng(0)
    x0 = rng.uniform(0, 1, (n, 3))
    for k, it in enumerate([0, 5, 10]):
        ps = ParticleState(x=jnp.asarray(x0 + 0.1 * k),
                           v=jnp.zeros((n, 3)),
                           props=jnp.zeros((n, 0)), tags=jnp.arange(n))
        write_particles(os.path.join(tmp_path, f"part.{it}"), ps, it)
    traj, its = assemble_trajectories(str(tmp_path), [0, 5, 10],
                                      tags=[3, 7])
    assert traj.shape == (3, 2, 3)
    assert np.allclose(traj[2, 0] - traj[0, 0], 0.2)
    assert np.allclose(traj[1, 1], x0[7] + 0.1)


def test_tinia_type_sticks():
    """PART_TYPE_TINIA_1 (reference particle_vars.f90:8-15): parsed type
    with stick wall BCs; the reference's RHS is commented out so tinia
    particles carry zero tendency, and stick-BC particles at the wall
    stay frozen for every type."""
    import jax.numpy as jnp
    grid = _grid()
    locate = pc.make_locator(grid)
    n = 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.1, 0.9, (n, 3)))
    ps = pc.ParticleState(x=x, v=jnp.zeros((n, 3)),
                          props=jnp.zeros((n, 0)),
                          tags=jnp.arange(n, dtype=jnp.int64))
    u = jnp.ones(grid.shape)
    props = pc.ParticleProps(type="tinia", bcs="stick")
    dx, dv = pc.particle_rhs(props, ps, locate, u, u, u)
    assert float(jnp.max(jnp.abs(dx))) == 0.0

    # stick BC freezes a tracer parked at the wall, moving elsewhere
    y0 = grid.y.nodes[0]
    x2 = x.at[0, 1].set(y0)
    ps2 = pc.ParticleState(x=x2, v=jnp.zeros((n, 3)),
                           props=jnp.zeros((n, 0)),
                           tags=jnp.arange(n, dtype=jnp.int64))
    props2 = pc.ParticleProps(type="tracer", bcs="stick")
    dx2, _ = pc.particle_rhs(props2, ps2, locate, u, u, u)
    assert float(jnp.max(jnp.abs(dx2[0]))) == 0.0
    assert float(jnp.min(jnp.abs(dx2[1:, 0]))) > 0.0


def test_bil_cloud_radiation_coupling():
    """Radiation enters the droplet equations (reference rhs_part_1.f90:
    82-86): with [Infrared] active, the non-diffusive droplet property
    (second slot) evolves differently than without radiation."""
    import jax.numpy as jnp
    from tlab_tpu.config import load_case, Ini
    from tlab_tpu.runtime import Simulation
    from tlab_tpu.particles.core import make_locator
    from tlab_tpu.particles.bil_cloud import BilCloudParams
    from tlab_tpu.particles.stepping import rk_step_with_particles
    base = open("tests/data/case01_small.ini").read()
    base = base.replace("Schmidt=1.0", "Schmidt=1.0,1.0")
    base = base.replace("""[Scalar]
ProfileScalar1=Tanh""", """[Scalar]
ProfileScalar2=Tanh
ThickScalar2=0.05
DeltaScalar2=-1.0
MeanScalar2=0.5
Scalar2Jmin=neumann
Scalar2Jmax=neumann
ProfileScalar1=Tanh""")
    rad_blk = """
[Infrared]
Type=grayliquid
Scalar=1
BoundaryConditions=1.0, 0.0
AbsorptionComponent1=10.0
"""
    outs = {}
    for tag, txt in (("norad", base), ("rad", base + rad_blk)):
        sim = Simulation.from_case(load_case(Ini(text=txt)))
        nx, ny, nz = sim.grid.shape
        rng = np.random.default_rng(4)
        y = sim.grid.y.nodes
        sfield = np.broadcast_to(
            0.5 + 0.3 * np.sin(np.pi * y)[None, :, None], (nx, ny, nz))
        st = State(u=jnp.zeros((nx, ny, nz)), v=jnp.zeros((nx, ny, nz)),
                   w=jnp.zeros((nx, ny, nz)),
                   s=jnp.stack([jnp.asarray(sfield)] * 2))
        n = 32
        x = np.stack([rng.uniform(0.2, 1.8, n), rng.uniform(0.2, 0.8, n),
                      np.zeros(n)], axis=1)
        ps = pc.ParticleState(x=jnp.asarray(x), v=jnp.zeros((n, 3)),
                              props=jnp.zeros((n, 2)),
                              tags=jnp.arange(n, dtype=jnp.int64))
        props = pc.ParticleProps(
            type="bil_cloud_3",
            bil_cloud=BilCloudParams(thermo=(1.0, 0.5, 0.2)))
        locate = make_locator(sim.grid)
        _, ps_out = rk_step_with_particles(sim.P, sim.grid, locate, props,
                                           st, ps, 1e-3)
        outs[tag] = np.asarray(ps_out.props)
    d = np.abs(outs["rad"][:, 1] - outs["norad"][:, 1])
    assert d.max() > 0.0, "radiation did not reach the droplet equations"
    assert np.isfinite(outs["rad"]).all()
