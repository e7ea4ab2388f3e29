"""bil_cloud droplet particles (reference PART_TYPE_BIL_CLOUD_3/4)."""
import numpy as np
import jax.numpy as jnp

from tlab_tpu.constants import BC
from tlab_tpu.dycore.incompressible import WallBCs, build_device_plans
from tlab_tpu.dycore.state import State
from tlab_tpu.fdm.plan import build_fdm_plan
from tlab_tpu.grid import uniform_grid
from tlab_tpu.particles import bil_cloud as bc
from tlab_tpu.particles.core import (ParticleProps, ParticleState,
                                     make_locator)
from tlab_tpu.physics.params import NSParams


def _setup(nx=32, ny=33, nz=8):
    grid = uniform_grid(nx, ny, nz, 2 * np.pi, 2.0, np.pi)
    fdm = build_fdm_plan(grid)
    nsp = NSParams(reynolds=100.0, schmidt=(1.0, 1.0))
    P = build_device_plans(fdm, nsp, WallBCs(
        s=(("dirichlet", "dirichlet"), ("dirichlet", "dirichlet"))),
        dtype=jnp.float64)
    return grid, fdm, nsp, P


def test_eulerian_sources_analytic():
    """s1 = sin(x), s2 = const: xi = 1 - th1 sin(x) - th2 c;
    Lap s1 = -sin(x); |grad xi|^2 = th1^2 cos^2(x)."""
    grid, fdm, nsp, P = _setup()
    x = grid.x.nodes
    th = (0.3, 0.2, 1.5)
    nxg, nyg, nzg = grid.shape
    s1 = np.broadcast_to(np.sin(x)[:, None, None], (nxg, nyg, nzg))
    s2 = np.full((nxg, nyg, nzg), 0.4)
    s = jnp.asarray(np.stack([s1, s2]))
    src = np.asarray(bc.eulerian_sources(
        P, s, nsp.visc, bc.BilCloudParams(thermo=th)))
    xi_exact = 1.0 - th[0] * s1 - th[1] * 0.4
    assert np.max(np.abs(src[1] - xi_exact)) < 1e-12
    src_a_exact = -nsp.visc * th[0] * (-s1)
    assert np.max(np.abs(src[0] - src_a_exact)) < 1e-6
    gr_exact = nsp.visc * th[0] ** 2 * np.cos(x)[:, None, None] ** 2
    assert np.max(np.abs(src[2] - gr_exact)) < 1e-6
    assert np.max(np.abs(src[3])) == 0.0


def test_droplet_rhs_formula():
    """Interpolated sources at a particle reproduce the reference droplet
    equations (rhs_part_1.f90:135-140) pointwise."""
    grid, fdm, nsp, P = _setup()
    th = (0.3, 0.2, 1.5)
    params = bc.BilCloudParams(thermo=th)
    locate = make_locator(grid)
    nxg, nyg, nzg = grid.shape
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((4, nxg, nyg, nzg)))
    # particle exactly on a grid node -> interpolation is exact
    i, j, k = 5, 7, 3
    pos = jnp.asarray([[grid.x.nodes[i], grid.y.nodes[j],
                        grid.z.nodes[k]]])
    d = np.asarray(bc.droplet_rhs(params, src, locate(pos)))[0]
    inv0 = 1.0 / (th[0] * th[2])
    sa, xi, gr, ra = (float(src[m, i, j, k]) for m in range(4))
    sig = 1.0 / (1.0 + np.exp(xi * inv0))
    assert abs(d[0] - (-sa * sig)) < 1e-12
    d5 = -ra * sig - gr * (-0.25 * inv0) / np.cosh(xi * (-0.5 * inv0)) ** 2
    assert abs(d[1] - d5) < 1e-12


def test_residence_and_clipping():
    params = bc.BilCloudParams(thermo=(1, 1, 1), y_lambda=1.5, y_base=0.5,
                               variant=4)
    y = jnp.asarray([2.0, 1.0, 0.2])       # above top / mid / below base
    res = jnp.ones((3, 2))
    out = np.asarray(bc.residence_update(params, 0.1, y, res))
    assert np.allclose(out[0], [1.1, 1.1])  # both clocks tick
    assert np.allclose(out[1], [1.0, 1.1])  # only base clock ticks
    assert np.allclose(out[2], [0.0, 0.0])  # memory loss below base
    assert np.asarray(bc.liquid_clip(jnp.asarray([-0.3, 0.7]))).min() == 0.0


def test_coupled_step_finite():
    """One coupled RK step with bil_cloud_4 particles on a stratified layer:
    everything stays finite, droplet props update, residence accumulates."""
    from tlab_tpu.particles.stepping import rk_step_with_particles
    grid, fdm, nsp, P = _setup(16, 17, 8)
    nxg, nyg, nzg = grid.shape
    y = grid.y.nodes
    rng = np.random.default_rng(1)
    s1 = np.broadcast_to(np.tanh((y - 1.0) / 0.3)[None, :, None],
                         (nxg, nyg, nzg)) + 0.01 * rng.standard_normal(
                             (nxg, nyg, nzg))
    s2 = 0.5 * s1 + 0.1
    state = State(u=jnp.asarray(0.1 * rng.standard_normal((nxg, nyg, nzg))),
                  v=jnp.zeros((nxg, nyg, nzg)), w=jnp.zeros((nxg, nyg, nzg)),
                  s=jnp.asarray(np.stack([s1, s2])))
    n_p = 50
    pos = np.column_stack([
        rng.uniform(0, 2 * np.pi, n_p), rng.uniform(0.1, 1.9, n_p),
        rng.uniform(0, np.pi, n_p)])
    ps = ParticleState(x=jnp.asarray(pos), v=jnp.zeros((n_p, 3)),
                       props=jnp.zeros((n_p, 4)),
                       tags=jnp.arange(n_p))
    params = bc.BilCloudParams(thermo=(0.5, 0.3, 1.2), y_lambda=1.6,
                               y_base=0.3, variant=4)
    pprops = ParticleProps(type="bil_cloud_4", bil_cloud=params)
    locate = make_locator(grid)
    st, ps2 = rk_step_with_particles(P, grid, locate, pprops, state, ps,
                                     0.01)
    assert np.isfinite(np.asarray(ps2.props)).all()
    assert np.isfinite(np.asarray(st.u)).all()
    # droplet scalars moved; residence clocks ticked for particles above base
    assert float(jnp.max(jnp.abs(ps2.props[:, 0]))) > 0.0
    above = np.asarray(ps2.x[:, 1]) > 0.3
    assert np.allclose(np.asarray(ps2.props[above, 3]), 0.01)
