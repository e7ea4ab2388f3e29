"""Grid container and generation.

One-dimensional node arrays per direction (x streamwise, y vertical,
z spanwise), possibly nonuniform in y. Equivalent role to the reference's
grid_dt + inigrid tool (src/base/tlab_grid.f90, src/tools/initialize/grid).
"""
from __future__ import annotations

import dataclasses
import struct

import numpy as np


@dataclasses.dataclass(frozen=True)
class Axis:
    nodes: np.ndarray        # float64 node positions, shape (n,)
    periodic: bool
    uniform: bool
    scale: float             # domain length (periodic: includes wrap spacing)

    @property
    def size(self) -> int:
        return int(self.nodes.shape[0])


@dataclasses.dataclass(frozen=True)
class Grid:
    x: Axis
    y: Axis
    z: Axis

    @property
    def shape(self):
        return (self.x.size, self.y.size, self.z.size)

    def axis(self, i: int) -> Axis:
        return (self.x, self.y, self.z)[i]


def make_axis(nodes: np.ndarray, periodic: bool) -> Axis:
    nodes = np.asarray(nodes, dtype=np.float64)
    n = nodes.shape[0]
    if n > 1:
        scale = float(nodes[-1] - nodes[0])
        if periodic:
            # periodic domain includes the wrap-around spacing
            # (cf. reference fdm.f90:164)
            scale = scale * (1.0 + 1.0 / (n - 1))
    else:
        scale = 1.0
    uniform = True
    if n > 2:
        d = np.diff(nodes)
        uniform = bool(np.max(np.abs(d - d[0])) <= 1e-10 * np.abs(d[0]))
    return Axis(nodes=nodes, periodic=periodic, uniform=uniform, scale=scale)


# ---------------------------------------------------------------------------
# Segment-based grid generation (inigrid equivalent)
# ---------------------------------------------------------------------------

def segment_uniform(n: int, x0: float, x1: float) -> np.ndarray:
    return np.linspace(x0, x1, n)


def segment_tanh(n: int, x0: float, x1: float, params) -> np.ndarray:
    """Grid-spacing profile ds/di = f0 + sum_i (fi-f0)/2 [1+tanh((s-si)/2 di)].

    Same functional family as the reference inigrid option 5
    (src/tools/initialize/grid/grid_main.f90); integrated numerically then
    rescaled to the requested interval.
    """
    f0 = params[0]
    rest = params[1:]
    s = np.arange(n, dtype=np.float64)
    ds = np.full(n, f0)
    for j in range(0, len(rest) - 2, 3):
        fi, si, di = rest[j], rest[j + 1], rest[j + 2]
        ds += (fi - f0) * 0.5 * (1.0 + np.tanh((s - si) / (2.0 * di)))
    x = np.concatenate([[0.0], np.cumsum(0.5 * (ds[1:] + ds[:-1]))])
    x = x0 + (x1 - x0) * x / x[-1]
    return x


def segment_exponential(n: int, x0: float, x1: float, params) -> np.ndarray:
    """Geometric stretching with given ratio (reference inigrid option 6)."""
    r = params[0]
    s = np.arange(n, dtype=np.float64)
    x = (np.power(r, s) - 1.0) / (r - 1.0) if r != 1.0 else s
    return x0 + (x1 - x0) * x / x[-1]


def build_axis_from_segments(segments, periodic: bool) -> Axis:
    """segments: list of dicts with keys n, scale, opts, params.

    A periodic axis generated with n points drops the last node (it
    duplicates node 0 across the wrap), matching the reference inigrid
    convention where points_1=N+1 with periodic=yes yields N nodes.
    """
    xs = []
    x0 = 0.0
    for seg in segments:
        n, scale, opts = seg["n"], seg["scale"], seg.get("opts", "uniform")
        params = seg.get("params", ())
        x1 = x0 + scale
        if opts == "uniform":
            part = segment_uniform(n, x0, x1)
        elif opts == "tanh":
            part = segment_tanh(n, x0, x1, params)
        elif opts in ("exponential", "geometric"):
            part = segment_exponential(n, x0, x1, params)
        else:
            raise ValueError(f"unknown segment opts {opts!r}")
        if xs:
            xs.append(part[1:])
        else:
            xs.append(part)
        x0 = x1
    nodes = np.concatenate(xs)
    if periodic:
        nodes = nodes[:-1]
    return make_axis(nodes, periodic)


def uniform_grid(nx, ny, nz, lx, ly, lz,
                 periodic=(True, False, True)) -> Grid:
    """Convenience constructor for uniform box grids."""
    def ax(n, length, per):
        if per:
            nodes = np.arange(n) * (length / n)
        else:
            nodes = np.linspace(0.0, length, n) if n > 1 else np.zeros(1)
        return make_axis(nodes, per)
    return Grid(ax(nx, lx, periodic[0]), ax(ny, ly, periodic[1]),
                ax(nz, lz, periodic[2]))


# ---------------------------------------------------------------------------
# Reference-format grid file I/O (Fortran sequential unformatted, cf.
# src/base/tlab_grid.f90:26-90: 3 record groups of sizes, scales, nodes).
# ---------------------------------------------------------------------------

def read_reference_grid(path: str, byteorder: str = "<") -> Grid:
    with open(path, "rb") as fh:
        data = fh.read()
    off = [0]

    def rec():
        n = struct.unpack_from(byteorder + "i", data, off[0])[0]
        payload = data[off[0] + 4: off[0] + 4 + n]
        tail = struct.unpack_from(byteorder + "i", data, off[0] + 4 + n)[0]
        assert tail == n, "corrupt Fortran record"
        off[0] += 8 + n
        return payload

    sizes = np.frombuffer(rec(), dtype=byteorder + "i4")
    scales = np.frombuffer(rec(), dtype=byteorder + "f8")
    nodes = [np.frombuffer(rec(), dtype=byteorder + "f8") for _ in range(3)]
    axes = []
    for i in range(3):
        assert nodes[i].shape[0] == sizes[i]
        # periodicity is not stored in the file; infer from scale vs extent
        extent = nodes[i][-1] - nodes[i][0] if sizes[i] > 1 else 0.0
        per = sizes[i] > 1 and abs(scales[i] - extent) > 1e-12 * max(scales[i], 1.0)
        axes.append(make_axis(nodes[i], per))
    return Grid(*axes)


def write_reference_grid(path: str, grid: Grid, byteorder: str = "<") -> None:
    def rec(payload: bytes) -> bytes:
        n = struct.pack(byteorder + "i", len(payload))
        return n + payload + n

    with open(path, "wb") as fh:
        sizes = np.array([grid.x.size, grid.y.size, grid.z.size],
                         dtype=byteorder + "i4")
        scales = np.array([grid.x.scale, grid.y.scale, grid.z.scale],
                          dtype=byteorder + "f8")
        fh.write(rec(sizes.tobytes()))
        fh.write(rec(scales.tobytes()))
        for ax in (grid.x, grid.y, grid.z):
            fh.write(rec(ax.nodes.astype(byteorder + "f8").tobytes()))
