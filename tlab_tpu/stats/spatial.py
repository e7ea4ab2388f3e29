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

    # gradient-correlation sums (reference MA_Ux..MA_Wz2 + the six cross
    # products MA_VxUy.., avgij_map.h:14-37): (9, 2, nx, ny) + (6, nx, ny)
    grad_sums: np.ndarray = None
    gradx_sums: np.ndarray = None
    # pressure correlations (MA_P, MA_PP, pressure-velocity): (5, nx, ny)
    p_sums: np.ndarray = None
    # mixed third moments for transport: u^2 v, w^2 v: (2, nx, ny)
    triple_sums: np.ndarray = None

    GRAD_NAMES = ("ux", "uy", "uz", "vx", "vy", "vz", "wx", "wy", "wz")
    GRADX_PAIRS = ((3, 1), (6, 2), (7, 5), (0, 4), (0, 8), (4, 8))
    #              VxUy    WxUz    WyVz    UxVy    UxWz    VyWz

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
                   pair_sums=np.zeros((len(pairs), nx, ny)), n_samples=0,
                   grad_sums=np.zeros((9, 2, nx, ny)),
                   gradx_sums=np.zeros((6, nx, ny)),
                   p_sums=np.zeros((5, nx, ny)),
                   triple_sums=np.zeros((2, nx, ny)))

    def accumulate(self, fields: dict, grads: dict = None,
                   p=None) -> None:
        """fields: name -> (nx, ny, nz); adds z-mean moments 1..4 and the
        cross products. grads (optional): name in GRAD_NAMES -> field;
        p (optional): pressure field. Extends the running sums with the
        reference's gradient/pressure correlation families."""
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
        if grads is not None and self.grad_sums is not None:
            g = [np.asarray(grads[n]) for n in self.GRAD_NAMES]
            for k in range(9):
                self.grad_sums[k, 0] += g[k].mean(axis=2)
                self.grad_sums[k, 1] += (g[k] * g[k]).mean(axis=2)
            for j, (ka, kb) in enumerate(self.GRADX_PAIRS):
                self.gradx_sums[j] += (g[ka] * g[kb]).mean(axis=2)
        if p is not None and self.p_sums is not None:
            pa = np.asarray(p)
            self.p_sums[0] += pa.mean(axis=2)
            self.p_sums[1] += (pa * pa).mean(axis=2)
            for j, n in enumerate(("u", "v", "w")):
                if n in za:
                    self.p_sums[2 + j] += (pa * za[n]).mean(axis=2)
        if self.triple_sums is not None and all(
                n in za for n in ("u", "v", "w")):
            self.triple_sums[0] += (za["u"] ** 2 * za["v"]).mean(axis=2)
            self.triple_sums[1] += (za["w"] ** 2 * za["v"]).mean(axis=2)
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
        # guard AFTER the power (tiny**1.5 underflows to 0 -> 0/0 NaN)
        return m3 / np.maximum(np.maximum(m2, 0.0) ** 1.5, 1e-300)

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

    def reduce_station_table(self, stations, visc: float, d1y=None) -> dict:
        """Derived per-station tables, the avg_flow_zt_reduce.f90 analog:
        means, Reynolds stresses, skewness/flatness, pseudo-dissipation
        (from the gradient-square sums), vorticity variances, pressure
        variance/velocity correlations, TKE turbulent transport."""
        n = max(self.n_samples, 1)
        out = {}
        gm = self.grad_sums[:, 0] / n if self.grad_sums is not None else None
        g2 = self.grad_sums[:, 1] / n if self.grad_sums is not None else None
        gx = self.gradx_sums / n if self.gradx_sums is not None else None
        for ix in stations:
            cols = {}
            for name in self.names:
                cols[f"r{name.upper()}"] = self.mean(name)[ix]
                cols[f"R{name}{name}"] = self.variance(name)[ix]
                cols[f"S{name.upper()}"] = self.skewness(name)[ix]
            for (na, nb) in self.pairs:
                cols[f"R{na}{nb}"] = self.covariance(na, nb)[ix]
            if gm is not None:
                # pseudo-dissipation: nu sum <g'^2> = nu sum (<g^2>-<g>^2)
                eps = sum(g2[k][ix] - gm[k][ix] ** 2 for k in range(9))
                cols["Eps"] = visc * eps
                # vorticity variances: e.g. <w_z'^2> with w_z = vx - uy
                # <(vx-uy)'^2> = var(vx) + var(uy) - 2 cov(vx, uy)
                vv = {k: g2[k][ix] - gm[k][ix] ** 2 for k in range(9)}
                cov_vxuy = gx[0][ix] - gm[3][ix] * gm[1][ix]
                cov_wxuz = gx[1][ix] - gm[6][ix] * gm[2][ix]
                cov_wyvz = gx[2][ix] - gm[7][ix] * gm[5][ix]
                cols["WZ2"] = vv[3] + vv[1] - 2.0 * cov_vxuy
                cols["WY2"] = vv[2] + vv[6] - 2.0 * cov_wxuz
                cols["WX2"] = vv[7] + vv[5] - 2.0 * cov_wyvz
            if self.p_sums is not None and self.n_samples:
                pm = self.p_sums[0][ix] / n
                cols["rP"] = pm
                cols["Rpp"] = self.p_sums[1][ix] / n - pm * pm
                for j, nm in enumerate(("u", "v", "w")):
                    if nm in self.names:
                        cols[f"Rp{nm}"] = self.p_sums[2 + j][ix] / n \
                            - pm * self.mean(nm)[ix]
            if self.triple_sums is not None and all(
                    nm in self.names for nm in ("u", "v", "w")) \
                    and d1y is not None:
                # turbulent transport of TKE: -d/dy <v'(u'^2+v'^2+w'^2)/2>
                U, V, W = (self.mean(nm) for nm in ("u", "v", "w"))
                uuv = self.triple_sums[0] / n
                wwv = self.triple_sums[1] / n
                vvv = self.sums[self.names.index("v"), 2] / n
                Ruv = self.covariance("u", "v")
                Rvw = self.covariance("v", "w")
                Ruu = self.variance("u")
                Rvv = self.variance("v")
                Rww = self.variance("w")
                t_u = uuv - 2.0 * U * Ruv - V * Ruu - U * U * V
                t_v = vvv - 3.0 * V * Rvv - V ** 3
                t_w = wwv - 2.0 * W * Rvw - V * Rww - W * W * V
                flux = 0.5 * (t_u + t_v + t_w)
                cols["Trp"] = -(np.asarray(d1y) @ flux[ix])
            out[ix] = cols
        return out

    def variance(self, name: str) -> np.ndarray:
        i = self.names.index(name)
        m = self.mean(name)
        return self.sums[i, 1] / max(self.n_samples, 1) - m * m

    # -- restart (reference st<itime>, avg_spatial.f90:19-29) ---------------
    def save(self, path: str, itime: int) -> None:
        extra = {}
        for key in ("grad_sums", "gradx_sums", "p_sums", "triple_sums"):
            v = getattr(self, key)
            if v is not None:
                extra[key] = v
        np.savez(path, names=np.asarray(self.names), sums=self.sums,
                 pairs=np.asarray(["|".join(p) for p in self.pairs]),
                 pair_sums=self.pair_sums,
                 n_samples=self.n_samples, itime=itime, **extra)
        return

    def _save_legacy(self, path: str, itime: int) -> None:
        np.savez_compressed(path, sums=self.sums, n=self.n_samples,
                            names=np.array(self.names), itime=itime)

    @classmethod
    def load(cls, path: str) -> "SpatialStats":
        d = np.load(path, allow_pickle=False)
        pairs = tuple(tuple(s.split("|")) for s in d["pairs"]) \
            if "pairs" in d else ()
        opt = {k: d[k] if k in d else None
               for k in ("grad_sums", "gradx_sums", "p_sums",
                         "triple_sums")}
        return cls(names=tuple(str(n) for n in d["names"]), sums=d["sums"],
                   pairs=pairs,
                   pair_sums=d["pair_sums"] if "pair_sums" in d else None,
                   n_samples=int(d["n_samples"]), **opt)

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
