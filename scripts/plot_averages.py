#!/usr/bin/env python3
"""Plot columns of an avg<it> statistics file against height
(the reference scripts/python/PlotAverages.py for this build's outputs).

Usage:
  python scripts/plot_averages.py avg10 Tke Rxy [--out fig.png]
  python scripts/plot_averages.py avg0.nc Tke --it 0 1 2   # NetCDF, times

Reads either the ASCII `avg<it>` layout (RTIME / GROUP lines + I J Y
columns) or the NetCDF `avg<it>.nc` written with [Main] FileFormat=netcdf.
With no variables given, lists what the file contains.
"""
import argparse
import sys

import numpy as np


def read_avg_ascii(path):
    """-> (rtime, y, {name: (ny,) column}, group map)."""
    groups = {}
    with open(path) as fh:
        rtime = float(fh.readline().split("=")[1])
        line = fh.readline()
        while line.startswith("GROUP"):
            toks = line.split("=", 1)[1].split()
            groups[toks[0]] = toks[1:]
            line = fh.readline()
        names = line.split()[3:]
        rows = np.loadtxt(fh)
    y = rows[:, 2]
    cols = {n: rows[:, 3 + i] for i, n in enumerate(names)}
    return rtime, y, cols, groups


def read_avg_nc(path):
    from scipy.io import netcdf_file
    f = netcdf_file(path, "r", mmap=False)
    y = f.variables["y"][:].copy()
    t = f.variables["t"][:].copy()
    cols = {k: v[:].copy() for k, v in f.variables.items()
            if k not in ("t", "y", "it")}
    f.close()
    return t, y, cols


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("file")
    ap.add_argument("variables", nargs="*")
    ap.add_argument("--out", default="")
    ap.add_argument("--it", type=int, nargs="*", default=[-1],
                    help="time records to plot (NetCDF files)")
    args = ap.parse_args(argv)

    is_nc = args.file.endswith(".nc")
    if is_nc:
        t, y, cols = read_avg_nc(args.file)
    else:
        rtime, y, cols, groups = read_avg_ascii(args.file)
    if not args.variables:
        print("variables:", " ".join(sorted(cols)))
        return 0

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(5, 4))
    for name in args.variables:
        c = cols[name]
        if is_nc:
            for it in args.it:
                ax.plot(c[:, it] if c.ndim == 2 else c, y,
                        label=f"{name} (t={t[it]:.3g})")
        else:
            ax.plot(c, y, label=name)
    ax.set_xlabel("profile")
    ax.set_ylabel("height y")
    ax.legend(frameon=False)
    ax.grid(linestyle="dotted")
    out = args.out or "avg_profiles.png"
    fig.savefig(out, bbox_inches="tight", dpi=150)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
