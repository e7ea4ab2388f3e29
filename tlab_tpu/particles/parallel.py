"""Owner-sharded particle ensembles on the ('x','z') pencil mesh.

TPU-native re-design of the reference's particle migration
(src/particles/particle_mpi_sort.f90 counting sort + point-to-point
exchange): each device owns a fixed-capacity slot array of the particles
inside its (x, z) block, tracked by a validity mask. After each step,
particles that crossed a block edge ride one lax.ppermute ring shift per
direction (x then z, so corner moves take the two passes), and the receiver
compacts them into free slots. Assumes at most one block crossed per step
(CFL-limited motion).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


class ShardedParticles(NamedTuple):
    x: jax.Array          # (cap, 3) positions (garbage where inactive)
    v: jax.Array          # (cap, 3)
    tags: jax.Array       # (cap,) int32; -1 marks a free slot
    mask: jax.Array       # (cap,) bool


def _block_bounds(grid, axis_name, n_dev):
    ax = {"x": grid.x, "z": grid.z}[axis_name]
    lo = ax.nodes[0]
    length = ax.scale
    edges = lo + length * np.arange(n_dev + 1) / n_dev
    return edges


def shard_particles(grid, pstate, px, pz, capacity):
    """Host-side initial distribution: returns per-device stacked arrays
    (n_dev, cap, ...) to be device_put with a ('x','z')-sharded leading dim."""
    xs = np.asarray(pstate.x)
    vs = np.asarray(pstate.v)
    tags = np.asarray(pstate.tags).astype(np.int32)
    ex = _block_bounds(grid, "x", px)
    ez = _block_bounds(grid, "z", pz) if pz > 1 else None
    n_dev = px * pz
    X = np.zeros((n_dev, capacity, 3))
    V = np.zeros((n_dev, capacity, 3))
    T = np.full((n_dev, capacity), -1, np.int32)
    M = np.zeros((n_dev, capacity), bool)
    ix = np.clip(np.searchsorted(ex, xs[:, 0], side="right") - 1, 0, px - 1)
    if ez is not None:
        iz = np.clip(np.searchsorted(ez, xs[:, 2], side="right") - 1,
                     0, pz - 1)
    else:
        iz = np.zeros_like(ix)
    dev = ix * pz + iz
    for d in range(n_dev):
        sel = np.where(dev == d)[0][:capacity]
        X[d, : sel.size] = xs[sel]
        V[d, : sel.size] = vs[sel]
        T[d, : sel.size] = tags[sel]
        M[d, : sel.size] = True
    return X, V, T, M


def _compact(p: ShardedParticles) -> ShardedParticles:
    """Move active slots to the front (stable)."""
    order = jnp.argsort(~p.mask, stable=True)
    return ShardedParticles(x=p.x[order], v=p.v[order],
                            tags=p.tags[order], mask=p.mask[order])


def _exchange_dir(p: ShardedParticles, send: jax.Array, axis_name: str,
                  shift: int) -> ShardedParticles:
    """Ship `send`-marked particles one step along the mesh axis ring."""
    n_dev = lax.axis_size(axis_name)
    perm = [(i, (i + shift) % n_dev) for i in range(n_dev)]
    keep = p.mask & ~send
    buf_x = jnp.where(send[:, None], p.x, 0.0)
    buf_v = jnp.where(send[:, None], p.v, 0.0)
    buf_t = jnp.where(send, p.tags, -1)
    rx = lax.ppermute(buf_x, axis_name, perm)
    rv = lax.ppermute(buf_v, axis_name, perm)
    rt = lax.ppermute(buf_t, axis_name, perm)
    rmask = rt >= 0
    # compact the kept particles, then fill the tail with received ones
    kept = _compact(ShardedParticles(p.x, p.v, p.tags, keep))
    recv = _compact(ShardedParticles(rx, rv, rt, rmask))
    n_keep = jnp.sum(kept.mask)
    cap = p.mask.shape[0]
    idx = jnp.arange(cap)
    take = idx - n_keep                      # receive slot k fills from recv
    take_c = jnp.clip(take, 0, cap - 1)
    use_recv = (idx >= n_keep) & (take_c < jnp.sum(recv.mask)) & \
        recv.mask[take_c]
    out_x = jnp.where(use_recv[:, None], recv.x[take_c], kept.x)
    out_v = jnp.where(use_recv[:, None], recv.v[take_c], kept.v)
    out_t = jnp.where(use_recv, recv.tags[take_c], kept.tags)
    out_m = kept.mask | use_recv
    return ShardedParticles(out_x, out_v, out_t, out_m)


def migrate(p: ShardedParticles, grid, axis_name: str, n_dev: int
            ) -> ShardedParticles:
    """One direction's two ring passes (+1 then -1) inside shard_map."""
    if n_dev <= 1:
        return p
    ax = {"x": grid.x, "z": grid.z}[axis_name]
    comp = {"x": 0, "z": 2}[axis_name]
    me = lax.axis_index(axis_name)

    def dist(p):
        # destination block from the (periodic-wrapped) global coordinate;
        # ring distance decides the shift direction (handles the wrap)
        pos = p.x[:, comp]
        target = jnp.clip(
            ((pos - ax.nodes[0]) / ax.scale * n_dev).astype(jnp.int32),
            0, n_dev - 1)
        return jnp.mod(target - me, n_dev)

    # masks must be recomputed between passes: the first exchange reshuffles
    # the slot layout
    p = _exchange_dir(p, p.mask & (dist(p) == 1), axis_name, +1)
    p = _exchange_dir(p, p.mask & (dist(p) == n_dev - 1), axis_name, -1)
    return p
