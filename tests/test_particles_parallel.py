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


def test_sharded_field_interpolation_advection():
    """Sharded trilinear interpolation with halo exchange: advecting
    particles through a smooth sheared velocity field on the 4x2 mesh
    matches the single-device integration to round-off (halo closes the
    stencil for edge-cell particles)."""
    px, pz = 4, 2
    mesh = make_mesh(px, pz)
    grid = uniform_grid(32, 17, 16, 2.0, 1.0, 1.6)
    n_part, cap = 96, 64
    ps = pc.init_particles(grid, n_part, seed=9)
    X, V, T, M = pp.shard_particles(grid, ps, px, pz, cap)

    # smooth velocity (x,z-periodic, y-dependent shear)
    xg = grid.x.nodes[:, None, None]
    yg = grid.y.nodes[None, :, None]
    zg = grid.z.nodes[None, None, :]
    u3 = 0.3 + 0.1 * np.sin(2 * np.pi * xg / 2.0) * np.cos(
        2 * np.pi * zg / 1.6) * np.ones_like(yg)
    w3 = np.broadcast_to(-0.2 + 0.1 * np.cos(2 * np.pi * xg / 2.0) * yg,
                         (32, 17, 16)).copy()
    dt, n_steps = 0.04, 30

    # single-device reference (forward Euler)
    locate = pc.make_locator(grid)
    x_ref = np.asarray(ps.x).copy()
    u3j, w3j = jnp.asarray(u3), jnp.asarray(w3)
    for _ in range(n_steps):
        loc = locate(jnp.asarray(x_ref))
        uu = np.asarray(pc.interpolate_to_particles(u3j, loc))
        ww = np.asarray(pc.interpolate_to_particles(w3j, loc))
        x_ref[:, 0] = np.mod(x_ref[:, 0] + dt * uu - grid.x.nodes[0],
                             grid.x.scale) + grid.x.nodes[0]
        x_ref[:, 2] = np.mod(x_ref[:, 2] + dt * ww - grid.z.nodes[0],
                             grid.z.scale) + grid.z.nodes[0]

    sh_p = NamedSharding(mesh, PSpec(("x", "z")))
    sh_f = NamedSharding(mesh, PSpec("x", None, "z"))
    Xd = jax.device_put(jnp.asarray(X.reshape(px * pz, cap, 3)), sh_p)
    Td = jax.device_put(jnp.asarray(T.reshape(px * pz, cap)), sh_p)
    Md = jax.device_put(jnp.asarray(M.reshape(px * pz, cap)), sh_p)
    ud = jax.device_put(u3j, sh_f)
    wd = jax.device_put(w3j, sh_f)
    blk_locate = pp.make_block_locator(grid, px, pz)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(PSpec(("x", "z")), PSpec(("x", "z")), PSpec(("x", "z")),
                  PSpec("x", None, "z"), PSpec("x", None, "z")),
        out_specs=(PSpec(("x", "z")),) * 3,
        check_vma=False)
    def run(x, t, m, u, w):
        p = pp.ShardedParticles(x=x[0], v=jnp.zeros_like(x[0]),
                                tags=t[0], mask=m[0])
        uh = pp.halo_exchange(u)
        wh = pp.halo_exchange(w)

        def step(_, p):
            loc = blk_locate(p.x)
            uu = pp.interpolate_block(uh, loc)
            ww = pp.interpolate_block(wh, loc)
            newx = p.x.at[:, 0].add(dt * uu).at[:, 2].add(dt * ww)
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
        return p.x[None], p.tags[None], p.mask[None]

    xo, to, mo = jax.jit(run)(Xd, Td, Md, ud, wd)
    xo = np.asarray(xo).reshape(px * pz, cap, 3)
    to = np.asarray(to).reshape(px * pz, cap)
    mo = np.asarray(mo).reshape(px * pz, cap)
    got = {int(t): xo[d, i] for d in range(px * pz)
           for i, t in enumerate(to[d]) if mo[d, i]}
    assert len(got) == n_part
    for tag in range(n_part):
        diff = np.abs(got[tag][[0, 2]] - x_ref[tag][[0, 2]])
        diff = np.minimum(diff, [grid.x.scale, grid.z.scale] - diff)
        assert np.max(diff) < 1e-9, (tag, diff)
