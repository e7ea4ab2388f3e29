"""Plane and tower extraction (reference src/tools/dns/planes.f90,
dns_tower.f90).

Planes: strided i/j/k-plane slices of selected fields written every
nitera_pln steps. Towers: strided (i,k) columns accumulated every step and
flushed with the restart cadence.
"""
from __future__ import annotations

import dataclasses
import os

import numpy as np


@dataclasses.dataclass
class PlaneSpec:
    axis: str              # 'i' | 'j' | 'k'
    indices: tuple         # node indices


def extract_plane(field: np.ndarray, spec: PlaneSpec) -> np.ndarray:
    ax = {"i": 0, "j": 1, "k": 2}[spec.axis]
    return np.take(np.asarray(field), spec.indices, axis=ax)


def write_planes(outdir: str, itime: int, state, specs,
                 pressure=None) -> None:
    """Field planes + (as the reference, which sizes every plane set as
    flow + scalars + PRESSURE, planes.f90 PLANES_INITIALIZE) the
    pressure plane when given."""
    for spec in specs:
        comps = [("u", state.u), ("v", state.v), ("w", state.w)]
        comps += [(f"s{i+1}", state.s[i]) for i in range(state.s.shape[0])]
        if pressure is not None:
            comps.append(("p", pressure))
        for name, comp in comps:
            pl = extract_plane(np.asarray(comp), spec)
            path = os.path.join(outdir,
                                f"planes{spec.axis.upper()}.{name}.{itime}")
            pl.astype("<f4").tofile(path)


@dataclasses.dataclass
class TowerAccumulator:
    """Strided-column time series, buffered in memory and flushed with
    restarts (reference dns_tower.f90:22-34)."""

    stride: tuple          # (si, sk)
    buffer: list = dataclasses.field(default_factory=list)

    def accumulate(self, itime: int, rtime: float, state, pressure=None):
        si, sk = self.stride
        cols = {}
        for name, comp in (("u", state.u), ("v", state.v), ("w", state.w)):
            cols[name] = np.asarray(comp)[::si, :, ::sk].copy()
        if pressure is not None:
            cols["p"] = np.asarray(pressure)[::si, :, ::sk].copy()
        for i in range(state.s.shape[0]):
            cols[f"s{i+1}"] = np.asarray(state.s[i])[::si, :, ::sk].copy()
        self.buffer.append((itime, rtime, cols))

    def flush(self, outdir: str) -> None:
        if not self.buffer:
            return
        it0, itN = self.buffer[0][0], self.buffer[-1][0]
        path = os.path.join(outdir, f"tower.{it0}-{itN}.npz")
        packed = {"itimes": np.array([b[0] for b in self.buffer]),
                  "rtimes": np.array([b[1] for b in self.buffer])}
        for name in self.buffer[0][2]:
            packed[name] = np.stack([b[2][name] for b in self.buffer])
        np.savez_compressed(path, **packed)
        self.buffer.clear()
