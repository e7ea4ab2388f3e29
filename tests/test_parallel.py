"""Decomposition-invariance tests on the virtual 8-device CPU mesh.

Equivalent of the reference's multi-node correctness strategy (SURVEY.md
section 4): the same step on 1 device and on a 2-D pencil mesh must agree to
round-off.
"""
import numpy as np
import jax
import jax.numpy as jnp

from tlab_tpu.dycore import incompressible as dyn
from tlab_tpu.dycore.state import State
from tlab_tpu.fdm.plan import build_fdm_plan
from tlab_tpu.grid import uniform_grid
from tlab_tpu.physics.params import NSParams
from tlab_tpu.parallel import make_mesh, field_sharding, gspmd_shardings
from tlab_tpu.parallel.mesh import scalar_field_sharding


def _setup(nx=32, ny=40, nz=16):
    grid = uniform_grid(nx, ny, nz, 2 * np.pi, np.pi, np.pi)
    fdm = build_fdm_plan(grid)
    nsp = NSParams(reynolds=100.0, schmidt=(1.0,))
    bcs = dyn.WallBCs.from_velocity_kind(
        "freeslip", "freeslip", scalar_bcs=(("neumann", "neumann"),))
    P = dyn.build_device_plans(fdm, nsp, bcs, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    state = State(u=jnp.asarray(rng.standard_normal((nx, ny, nz))),
                  v=jnp.asarray(rng.standard_normal((nx, ny, nz))),
                  w=jnp.asarray(rng.standard_normal((nx, ny, nz))),
                  s=jnp.asarray(rng.standard_normal((1, nx, ny, nz))))
    return P, state


def test_step_decomposition_invariance():
    assert len(jax.devices()) >= 8
    P, state = _setup()
    mesh = make_mesh(4, 2)
    Psh = dict(P)
    Psh["ell"] = dict(P["ell"])
    Psh["ell"]["shardings"] = gspmd_shardings(mesh)
    sh = field_sharding(mesh)
    sh4 = scalar_field_sharding(mesh)
    state_sh = State(u=jax.device_put(state.u, sh),
                     v=jax.device_put(state.v, sh),
                     w=jax.device_put(state.w, sh),
                     s=jax.device_put(state.s, sh4))

    out_sh = jax.jit(lambda st: dyn.rk_step(Psh, st, 1e-3)[0])(state_sh)
    out_1 = jax.jit(lambda st: dyn.rk_step(P, st, 1e-3)[0])(state)

    for a, b in zip(out_sh, out_1):
        if a is None or b is None:
            continue
        assert np.max(np.abs(np.asarray(a) - np.asarray(b))) < 1e-12


def test_mesh_shapes():
    mesh = make_mesh(2, 4)
    assert mesh.shape == {"x": 2, "z": 4}
