"""Plane and tower extraction (reference src/tools/dns/planes.f90,
dns_tower.f90), written in the REFERENCE binary layouts
(io/reference_formats.py) so scripts/python/{Planes2nc,tower2nc,
PlotTowers}.py consume them unmodified.

Planes: strided i/j/k-plane slices of [u, v, w, scalars..., pressure]
stacked var-major into ONE planesI/J/K.<it> float32 file per direction.
Towers: strided (i, j, k) columns + horizontal means accumulated every
step, flushed with the restart cadence into per-column raw files.
"""
from __future__ import annotations

import dataclasses
import os

import numpy as np

from tlab_tpu.io import reference_formats as rf


@dataclasses.dataclass
class PlaneSpec:
    axis: str              # 'i' | 'j' | 'k'
    indices: tuple         # node indices (0-based)


def extract_plane(field: np.ndarray, spec: PlaneSpec) -> np.ndarray:
    ax = {"i": 0, "j": 1, "k": 2}[spec.axis]
    return np.take(np.asarray(field), spec.indices, axis=ax)


def write_planes(outdir: str, itime: int, state, specs,
                 pressure=None) -> None:
    """Reference planesI/J/K.<it> subarray files: every plane set carries
    flow + scalars + PRESSURE (planes.f90 PLANES_INITIALIZE var count).

    Plane slices are taken DEVICE-SIDE (jnp.take on the possibly-sharded
    arrays) so a mesh run fetches only the planes, never the full
    fields, across the host boundary."""
    import jax.numpy as jnp
    fields = [state.u, state.v, state.w]
    fields += [state.s[i] for i in range(state.s.shape[0])]
    if pressure is not None:
        fields.append(pressure)
    for spec in specs:
        ax = {"i": 0, "j": 1, "k": 2}[spec.axis]
        idx = jnp.asarray(list(spec.indices))
        small = [np.asarray(jnp.take(jnp.asarray(f), idx, axis=ax))
                 for f in fields]
        rf.write_planes_file(outdir, itime, spec.axis, small,
                             range(len(spec.indices)))


@dataclasses.dataclass
class TowerAccumulator:
    """Strided-column time series, buffered in memory and flushed with
    restarts (reference dns_tower.f90:22-34).  stride = (si, sj, sk) --
    ALL three components of [SaveTowers] Stride, including the y stride
    the tower records are subsampled with."""

    stride: tuple          # (si, sj, sk)
    buffer: list = dataclasses.field(default_factory=list)

    def accumulate(self, itime: int, rtime: float, state, pressure=None):
        """Strided columns + horizontal means, reduced DEVICE-SIDE so a
        sharded run moves only the tower columns to host each step (the
        per-step full-field D2H was the reference tower module's cost
        too, dns_tower.f90 -- here the slice/mean stay on the mesh)."""
        si, sj, sk = self.stride[:3]
        ordered = [(1, state.u), (2, state.v), (3, state.w)]
        if pressure is not None:
            ordered.append((4, pressure))
        if state.s.shape[0]:
            ordered.append((5, state.s[0]))
        cols = {k: np.asarray(f[::si, ::sj, ::sk]) for k, f in ordered}
        means = {k: np.asarray(f[:, ::sj, :].mean(axis=(0, 2)))
                 for k, f in ordered}
        self.buffer.append((itime, rtime, cols, means))
        self._nx = state.u.shape[0]
        self._nz = state.u.shape[2]

    def flush(self, outdir: str) -> None:
        if not self.buffer:
            return
        si, sj, sk = self.stride[:3]
        times = [b[1] for b in self.buffer]
        itimes = [b[0] for b in self.buffer]
        columns = {iv: np.stack([b[2][iv] for b in self.buffer])
                   for iv in self.buffer[0][2]}
        means = {iv: np.stack([b[3][iv] for b in self.buffer])
                 for iv in self.buffer[0][3]}
        ipos = tuple(range(1, self._nx + 1, si))       # 1-based global
        kpos = tuple(range(1, self._nz + 1, sk))
        rf.write_tower_files(outdir, times, itimes, columns, means,
                             ipos, kpos)
        self.buffer.clear()
