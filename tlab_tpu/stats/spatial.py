"""Spatial-mode running statistics (reference src/statistics/avg_spatial.f90
+ tools/dns/avg_flow_zt_reduce.f90).

For spatially developing flows, statistics are accumulated over (z, t) at
every (x, y) point: running sums of the moments, flushed/restarted with the
simulation (the reference's st<itime> files).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp


_DEFAULT_PAIRS = (("u", "v"), ("u", "w"), ("v", "w"))


@dataclasses.dataclass
class SpatialStats:
    """Running (z,t) moment sums, shape (nvar, nmom, nx, ny); cross-moment
    sums (npair, nx, ny) give the Reynolds stresses / turbulent fluxes at
    every x-station (reference avg_flow_zt_reduce.f90 running sums)."""

    names: tuple
    sums: np.ndarray
    pairs: tuple = ()
    pair_sums: np.ndarray = None
    n_samples: int = 0

    @classmethod
    def create(cls, nx: int, ny: int, names=("u", "v", "w", "s1"),
               pairs=None):
        names = tuple(names)
        if pairs is None:
            pairs = tuple(p for p in _DEFAULT_PAIRS
                          if p[0] in names and p[1] in names)
            pairs = pairs + tuple(("v", n) for n in names
                                  if n.startswith("s"))
        return cls(names=names,
                   sums=np.zeros((len(names), 4, nx, ny)),
                   pairs=tuple(pairs),
                   pair_sums=np.zeros((len(pairs), nx, ny)), n_samples=0)

    def accumulate(self, fields: dict) -> None:
        """fields: name -> (nx, ny, nz); adds z-mean moments 1..4 and the
        cross products."""
        za = {}
        for i, name in enumerate(self.names):
            a = np.asarray(fields[name])
            za[name] = a
            self.sums[i, 0] += a.mean(axis=2)
            a2 = a * a
            self.sums[i, 1] += a2.mean(axis=2)
            self.sums[i, 2] += (a2 * a).mean(axis=2)
            self.sums[i, 3] += (a2 * a2).mean(axis=2)
        for j, (na, nb) in enumerate(self.pairs):
            self.pair_sums[j] += (za[na] * za[nb]).mean(axis=2)
        self.n_samples += 1

    def mean(self, name: str) -> np.ndarray:
        i = self.names.index(name)
        return self.sums[i, 0] / max(self.n_samples, 1)

    def covariance(self, na: str, nb: str) -> np.ndarray:
        """<a'b'> = <ab> - <a><b> at every (x, y)."""
        j = self.pairs.index((na, nb))
        n = max(self.n_samples, 1)
        return (self.pair_sums[j] / n
                - self.mean(na) * self.mean(nb))

    def skewness(self, name: str) -> np.ndarray:
        i = self.names.index(name)
        n = max(self.n_samples, 1)
        m = self.sums[i, 0] / n
        m2 = self.sums[i, 1] / n - m ** 2
        m3 = self.sums[i, 2] / n - 3 * m * self.sums[i, 1] / n + 2 * m ** 3
        return m3 / np.maximum(m2, 1e-300) ** 1.5

    def station_table(self, x_nodes, y_nodes, stations) -> dict:
        """Per-station profile tables (reference avg_spatial.f90 stations):
        stations is a list of x indices; returns {i_x: {col: (ny,)}}."""
        out = {}
        for ix in stations:
            cols = {}
            for name in self.names:
                cols[f"r{name.upper()}"] = self.mean(name)[ix]
                cols[f"R{name}{name}"] = self.variance(name)[ix]
            for (na, nb) in self.pairs:
                cols[f"R{na}{nb}"] = self.covariance(na, nb)[ix]
            out[ix] = cols
        return out

    def variance(self, name: str) -> np.ndarray:
        i = self.names.index(name)
        m = self.mean(name)
        return self.sums[i, 1] / max(self.n_samples, 1) - m * m

    # -- restart (reference st<itime>, avg_spatial.f90:19-29) ---------------
    def save(self, path: str, itime: int) -> None:
        np.savez(path, names=np.asarray(self.names), sums=self.sums,
                 pairs=np.asarray(["|".join(p) for p in self.pairs]),
                 pair_sums=self.pair_sums,
                 n_samples=self.n_samples, itime=itime)
        return

    def _save_legacy(self, path: str, itime: int) -> None:
        np.savez_compressed(path, sums=self.sums, n=self.n_samples,
                            names=np.array(self.names), itime=itime)

    @classmethod
    def load(cls, path: str) -> "SpatialStats":
        d = np.load(path, allow_pickle=False)
        pairs = tuple(tuple(s.split("|")) for s in d["pairs"]) \
            if "pairs" in d else ()
        return cls(names=tuple(str(n) for n in d["names"]), sums=d["sums"],
                   pairs=pairs,
                   pair_sums=d["pair_sums"] if "pair_sums" in d else None,
                   n_samples=int(d["n_samples"]))

    @classmethod
    def _load_legacy(cls, path: str) -> "SpatialStats":
        d = np.load(path, allow_pickle=False)
        return cls(names=tuple(str(n) for n in d["names"]),
                   sums=d["sums"], n_samples=int(d["n"]))


def state_fields(state) -> dict:
    out = {"u": state.u, "v": state.v, "w": state.w}
    for i in range(state.s.shape[0]):
        out[f"s{i + 1}"] = state.s[i]
    return out
