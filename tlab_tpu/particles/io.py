"""Particle restart files and trajectory accumulation (reference
src/particles/io_particle.f90, src/tools/dns/particle_trajectories.f90).

Format: int64 header (n_part, n_props, itime) + int64 tags + float64
positions (np, 3) + velocities (np, 3) + props.
"""
from __future__ import annotations

import dataclasses
import os
import struct

import numpy as np
import jax.numpy as jnp

from tlab_tpu.particles.core import ParticleState

_HDR = struct.Struct("<3q")


def write_particles(path: str, pstate: ParticleState, itime: int = 0) -> None:
    x = np.asarray(pstate.x, np.float64)
    v = np.asarray(pstate.v, np.float64)
    props = np.asarray(pstate.props, np.float64)
    tags = np.asarray(pstate.tags, np.int64)
    with open(path, "wb") as fh:
        fh.write(_HDR.pack(x.shape[0], props.shape[1], itime))
        fh.write(tags.tobytes())
        fh.write(x.tobytes())
        fh.write(v.tobytes())
        fh.write(props.tobytes())


def read_particles(path: str):
    with open(path, "rb") as fh:
        data = fh.read()
    n, nprops, itime = _HDR.unpack_from(data, 0)
    off = _HDR.size
    tags = np.frombuffer(data, "<i8", n, off); off += 8 * n
    x = np.frombuffer(data, "<f8", 3 * n, off).reshape(n, 3); off += 24 * n
    v = np.frombuffer(data, "<f8", 3 * n, off).reshape(n, 3); off += 24 * n
    props = np.frombuffer(data, "<f8", nprops * n, off).reshape(n, nprops)
    st = ParticleState(x=jnp.asarray(x), v=jnp.asarray(v),
                       props=jnp.asarray(props), tags=jnp.asarray(tags))
    return st, itime


@dataclasses.dataclass
class TrajectoryAccumulator:
    """Buffered trajectories of tagged particles, flushed with restarts."""

    tag_ids: np.ndarray
    buffer: list = dataclasses.field(default_factory=list)

    def accumulate(self, itime: int, rtime: float, pstate: ParticleState):
        idx = np.asarray(self.tag_ids)
        self.buffer.append((itime, rtime,
                            np.asarray(pstate.x)[idx].copy(),
                            np.asarray(pstate.v)[idx].copy()))

    def flush(self, outdir: str) -> None:
        if not self.buffer:
            return
        it0, itN = self.buffer[0][0], self.buffer[-1][0]
        np.savez_compressed(
            os.path.join(outdir, f"trajectories.{it0}-{itN}.npz"),
            itimes=np.array([b[0] for b in self.buffer]),
            rtimes=np.array([b[1] for b in self.buffer]),
            x=np.stack([b[2] for b in self.buffer]),
            v=np.stack([b[3] for b in self.buffer]),
            tags=self.tag_ids)
        self.buffer.clear()


def particle_pdfs(pstate, prop_index, y_edges, vmin: float, vmax: float,
                  nbins: int = 64):
    """Per-y-slab histograms of one particle property (reference
    src/particles/particle_pdf.f90): returns (n_slabs, nbins) counts and
    the value bin edges."""
    import numpy as np
    y = np.asarray(pstate.x[:, 1])
    if prop_index < 0:          # velocity magnitude convenience
        vals = np.linalg.norm(np.asarray(pstate.v), axis=1)
    else:
        vals = np.asarray(pstate.props[:, prop_index])
    n_slabs = len(y_edges) - 1
    counts = np.zeros((n_slabs, nbins), np.int64)
    edges = np.linspace(vmin, vmax, nbins + 1)
    for j in range(n_slabs):
        sel = (y >= y_edges[j]) & (y < y_edges[j + 1])
        counts[j], _ = np.histogram(vals[sel], bins=edges)
    return counts, edges


def write_particle_pdfs(path: str, counts, edges, itime: int) -> None:
    import numpy as np
    np.savez(path, counts=counts, edges=edges, itime=itime)


def assemble_trajectories(outdir: str, iterations, tags):
    """Offline trajectory assembly from saved particle restarts (reference
    tools/particles/particle_pos_trajec.f90 / particle_trajec.f90):
    positions of the tagged particles across the snapshot series, sorted
    by tag. Returns (n_times, n_tags, 3) plus the iteration list."""
    import os
    import numpy as np
    tags = np.asarray(sorted(tags))
    out = np.full((len(iterations), tags.size, 3), np.nan)
    for it_idx, it in enumerate(iterations):
        ps, _ = read_particles(os.path.join(outdir, f"part.{it}"))
        ptags = np.asarray(ps.tags)
        pos = np.asarray(ps.x)
        idx = {int(t): i for i, t in enumerate(ptags)}
        for j, t in enumerate(tags):
            if int(t) in idx:
                out[it_idx, j] = pos[idx[int(t)]]
    return out, list(iterations)
