"""Owner-sharded particle migration on the CPU mesh: particles advected
across block boundaries (and the periodic wrap) stay consistent with a
single-device reference."""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import NamedSharding, PartitionSpec as PSpec

from tlab_tpu.grid import uniform_grid
from tlab_tpu.parallel import make_mesh
from tlab_tpu.particles import core as pc
from tlab_tpu.particles import parallel as pp


def test_sharded_advection_migration():
    px, pz = 4, 2
    mesh = make_mesh(px, pz)
    grid = uniform_grid(32, 9, 16, 2.0, 1.0, 1.6)
    n_part, cap = 96, 64
    ps = pc.init_particles(grid, n_part, seed=4)
    X, V, T, M = pp.shard_particles(grid, ps, px, pz, cap)

    u0, w0 = 0.37, -0.21                  # uniform drift (crosses blocks+wrap)
    dt = 0.05
    n_steps = 40

    sh = NamedSharding(mesh, PSpec(("x", "z")))
    Xd = jax.device_put(jnp.asarray(X.reshape(px * pz, cap, 3)), sh)
    Vd = jax.device_put(jnp.asarray(V.reshape(px * pz, cap, 3)), sh)
    Td = jax.device_put(jnp.asarray(T.reshape(px * pz, cap)), sh)
    Md = jax.device_put(jnp.asarray(M.reshape(px * pz, cap)), sh)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(PSpec(("x", "z")),) * 4,
        out_specs=(PSpec(("x", "z")),) * 4,
        check_vma=False)
    def run(x, v, t, m):
        p = pp.ShardedParticles(x=x[0], v=v[0], tags=t[0], mask=m[0])

        def step(_, p):
            newx = p.x.at[:, 0].add(u0 * dt).at[:, 2].add(w0 * dt)
            # periodic wrap
            newx = newx.at[:, 0].set(
                jnp.mod(newx[:, 0] - grid.x.nodes[0], grid.x.scale)
                + grid.x.nodes[0])
            newx = newx.at[:, 2].set(
                jnp.mod(newx[:, 2] - grid.z.nodes[0], grid.z.scale)
                + grid.z.nodes[0])
            p = pp.ShardedParticles(newx, p.v, p.tags, p.mask)
            p = pp.migrate(p, grid, "x", px)
            p = pp.migrate(p, grid, "z", pz)
            return p

        p = jax.lax.fori_loop(0, n_steps, step, p)
        return p.x[None], p.v[None], p.tags[None], p.mask[None]

    xo, vo, to, mo = jax.jit(run)(Xd, Vd, Td, Md)
    xo = np.asarray(xo).reshape(px * pz, cap, 3)
    to = np.asarray(to).reshape(px * pz, cap)
    mo = np.asarray(mo).reshape(px * pz, cap)

    # no particles lost or duplicated
    tags_out = np.sort(to[mo])
    assert tags_out.size == n_part
    assert np.array_equal(tags_out, np.arange(n_part))

    # positions match the single-device analytic drift
    x_ref = np.asarray(ps.x).copy()
    x_ref[:, 0] = np.mod(x_ref[:, 0] + u0 * dt * n_steps, grid.x.scale)
    x_ref[:, 2] = np.mod(x_ref[:, 2] + w0 * dt * n_steps, grid.z.scale)
    got = {int(t): xo[d, i] for d in range(px * pz)
           for i, t in enumerate(to[d]) if mo[d, i]}
    for tag in range(n_part):
        diff = np.abs(got[tag][[0, 2]] - x_ref[tag][[0, 2]])
        diff = np.minimum(diff, [grid.x.scale, grid.z.scale] - diff)
        assert np.max(diff) < 1e-10, tag

    # ownership: every active particle sits in its device's block
    ex = np.linspace(grid.x.nodes[0], grid.x.nodes[0] + grid.x.scale, px + 1)
    for d in range(px * pz):
        ix = d // pz
        sel = mo[d]
        if sel.any():
            assert np.all(xo[d, sel, 0] >= ex[ix] - 1e-9)
            assert np.all(xo[d, sel, 0] < ex[ix + 1] + 1e-9)
