"""Semi-implicit (SMR91) diffusion scheme: stability beyond the explicit
diffusive limit and accuracy of the implicit diffusion."""
import numpy as np
import jax
import jax.numpy as jnp

from tlab_tpu.config import load_case, Ini
from tlab_tpu.dycore import implicit as imp
from tlab_tpu.dycore.state import State
from tlab_tpu.runtime import Simulation
from tests.test_channel import INI_TEXT


def test_diffusion_decay_large_dt():
    """Pure diffusion of a sin mode at dt far beyond the explicit limit."""
    sim = Simulation.from_case(load_case(Ini(text=INI_TEXT)))
    nx, ny, nz = sim.grid.shape
    y = sim.grid.y.nodes
    nu = sim.nsp.visc                         # 0.1
    # kill the body force for a pure-diffusion test
    sim.P["bodyforce"] = None
    k = np.pi                                  # sin(pi y), zero at walls
    u0 = np.sin(k * y)
    state = State(
        u=jnp.broadcast_to(jnp.asarray(u0)[None, :, None], (nx, ny, nz)),
        v=jnp.zeros((nx, ny, nz)), w=jnp.zeros((nx, ny, nz)),
        s=jnp.zeros((1, nx, ny, nz)))
    dy = y[1] - y[0]
    dt_explicit_limit = 0.3 / (nu * (1.0 / dy ** 2))   # would be ~1e-3
    dt = 20 * dt_explicit_limit
    step = jax.jit(lambda st: imp.rk_step_implicit(sim.P, st, dt)[0])
    n = 30
    for _ in range(n):
        state = step(state)
    t = n * dt
    decay = np.exp(-nu * k ** 2 * t)
    got = float(state.u[0, ny // 2, 0])
    assert np.isfinite(got)
    assert abs(got - decay) / decay < 0.02, (got, decay)


def test_poiseuille_steady_implicit():
    """The Poiseuille profile is steady under the implicit scheme too."""
    sim = Simulation.from_case(load_case(Ini(text=INI_TEXT)))
    nx, ny, nz = sim.grid.shape
    y = sim.grid.y.nodes
    nu = sim.nsp.visc
    u_exact = (0.8 / (2 * nu)) * y * (1.0 - y)
    state = State(
        u=jnp.broadcast_to(jnp.asarray(u_exact)[None, :, None], (nx, ny, nz)),
        v=jnp.zeros((nx, ny, nz)), w=jnp.zeros((nx, ny, nz)),
        s=jnp.zeros((1, nx, ny, nz)))
    dt = 5e-3                                  # ~10x explicit diffusive limit
    step = jax.jit(lambda st: imp.rk_step_implicit(sim.P, st, dt)[0])
    out = state
    for _ in range(50):
        out = step(out)
    drift = float(jnp.max(jnp.abs(out.u - state.u)))
    assert drift < 1e-6, drift
