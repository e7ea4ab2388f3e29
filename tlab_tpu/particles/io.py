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
        if idx.size == 0:
            self.buffer.append((itime, rtime, np.zeros((0, 3)),
                                np.zeros((0, 3))))
            return
        # fast path: gather the tagged ROWS on device (tiny D2H) and only
        # fall back to the full-SoA tag search if the positional identity
        # does not hold (post-migration reorder/padding)
        if pstate.tags is not None and idx.max() < pstate.tags.shape[0]:
            t_sel = np.asarray(pstate.tags[idx])
            if np.array_equal(t_sel, idx):
                self.buffer.append((itime, rtime,
                                    np.asarray(pstate.x[idx]),
                                    np.asarray(pstate.v[idx])))
                return
        tags = np.asarray(pstate.tags) if pstate.tags is not None else None
        if tags is not None and (idx.max() >= tags.shape[0]
                                 or not np.array_equal(tags[idx], idx)):
            # owner-sharded migration reorders/pads the SoA: look the
            # tagged particles up by tag (particle_trajectories.f90 tag
            # search); tags absent this step (culled/remote) keep NaN
            order = np.argsort(tags, kind="stable")
            pos = np.searchsorted(tags, idx, sorter=order)
            pos = np.minimum(pos, tags.shape[0] - 1)
            idx2 = order[pos]
            found = tags[idx2] == idx
            x = np.full((idx.shape[0], 3), np.nan)
            v = np.full((idx.shape[0], 3), np.nan)
            x[found] = np.asarray(pstate.x)[idx2[found]]
            v[found] = np.asarray(pstate.v)[idx2[found]]
            self.buffer.append((itime, rtime, x, v))
            return
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


def particle_pdf_reference(grid, pstate, scal_field, locate,
                           subdomain, pdf_max: float, pdf_interval: float,
                           path: str) -> None:
    """The reference's in-run PARTICLE_PDF (particle_pdf.f90): histograms
    of (1) the LAST scalar field interpolated to the particle positions
    and (2,3) the first two particle property columns, restricted to the
    scale-normalized subdomain (x0,x1,y0,y1[,z0,z1]); bins of width
    pdf_interval on [0, pdf_max); ASCII rows 'value c1 c2 c3'
    (written at the statistics cadence, dns_statistics.f90:212-214)."""
    import numpy as np
    from tlab_tpu.particles.core import interpolate_to_particles
    nb = max(int(pdf_max / pdf_interval), 1)
    loc = locate(pstate.x)
    vals = np.asarray(interpolate_to_particles(scal_field, loc))
    xs = np.asarray(pstate.x)
    sub = list(subdomain) + [0.0] * (6 - len(subdomain))
    scales = (grid.x.scale, grid.y.scale,
              grid.z.scale if grid.z.size > 1 else 1.0)
    sel = np.ones(xs.shape[0], bool)
    for d in range(3):
        lo, hi = sub[2 * d], sub[2 * d + 1]
        if hi > lo:
            xn = xs[:, d] / scales[d]
            sel &= (xn >= lo) & (xn <= hi)
    cols = [vals]
    props = np.asarray(pstate.props) if pstate.props is not None else None
    for ip in range(2):
        cols.append(props[:, ip] if props is not None
                    and props.shape[1] > ip else np.zeros_like(vals))
    bins = np.zeros((nb, 3), np.int64)
    for ic, cv in enumerate(cols):
        # reference binning j = 1 + int(v/interval) TRUNCATES toward
        # zero, so values in (-interval, interval) share the first bin
        # (particle_pdf.f90:77-83)
        j = np.trunc(cv[sel] / pdf_interval).astype(int)
        j = j[(j >= 0) & (j < nb)]
        np.add.at(bins[:, ic], j, 1)
    with open(path, "w") as fh:
        for i in range(nb):
            fh.write(f"{i * pdf_interval:6.3f} {bins[i, 0]:20d} "
                     f"{bins[i, 1]:20d} {bins[i, 2]:20d}\n")


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
