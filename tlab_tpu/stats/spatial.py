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


@dataclasses.dataclass
class SpatialStats:
    """Running (z,t) moment sums, shape (nvar, nmom, nx, ny)."""

    names: tuple
    sums: np.ndarray
    n_samples: int = 0

    @classmethod
    def create(cls, nx: int, ny: int, names=("u", "v", "w", "s1")):
        return cls(names=tuple(names),
                   sums=np.zeros((len(names), 2, nx, ny)), n_samples=0)

    def accumulate(self, fields: dict) -> None:
        """fields: name -> (nx, ny, nz); adds the z-mean and z-mean-square."""
        for i, name in enumerate(self.names):
            a = np.asarray(fields[name])
            self.sums[i, 0] += a.mean(axis=2)
            self.sums[i, 1] += (a * a).mean(axis=2)
        self.n_samples += 1

    def mean(self, name: str) -> np.ndarray:
        i = self.names.index(name)
        return self.sums[i, 0] / max(self.n_samples, 1)

    def variance(self, name: str) -> np.ndarray:
        i = self.names.index(name)
        m = self.mean(name)
        return self.sums[i, 1] / max(self.n_samples, 1) - m * m

    # -- restart (reference st<itime>, avg_spatial.f90:19-29) ---------------
    def save(self, path: str, itime: int) -> None:
        np.savez_compressed(path, sums=self.sums, n=self.n_samples,
                            names=np.array(self.names), itime=itime)

    @classmethod
    def load(cls, path: str) -> "SpatialStats":
        d = np.load(path, allow_pickle=False)
        return cls(names=tuple(str(n) for n in d["names"]),
                   sums=d["sums"], n_samples=int(d["n"]))


def state_fields(state) -> dict:
    out = {"u": state.u, "v": state.v, "w": state.w}
    for i in range(state.s.shape[0]):
        out[f"s{i + 1}"] = state.s[i]
    return out
