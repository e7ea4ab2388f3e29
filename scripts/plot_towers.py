#!/usr/bin/env python3
"""Plot tower time series (the reference scripts/python/PlotTowers.py
for this build's tower outputs).

Towers are per-(i,k) vertical soundings saved every stride steps as
raw float64 records [time, itime, ny values].

Usage:
  python scripts/plot_towers.py tower.mean.u.000001 --ny 64 [--j 10 32]
         [--out fig.png]
"""
import argparse
import sys

import numpy as np


def read_tower(path, ny):
    raw = np.fromfile(path, dtype="<f8").reshape(-1, ny + 2)
    return raw[:, 0], raw[:, 1].astype(int), raw[:, 2:]


def _ny_from_ini(ini="tlab.ini"):
    for line in open(ini):
        if line.lower().replace(" ", "").startswith("jmax="):
            return int(line.split("=", 1)[1])
    raise SystemExit("pass --ny (no Jmax found in tlab.ini)")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("--ny", type=int, default=0)
    ap.add_argument("--j", type=int, nargs="*", default=None,
                    help="y indices to trace (default: quartiles)")
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)
    ny = args.ny or _ny_from_ini()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(6, 4))
    for path in args.files:
        t, it, data = read_tower(path, ny)
        js = args.j if args.j else [ny // 4, ny // 2, 3 * ny // 4]
        for j in js:
            ax.plot(t, data[:, j], label=f"{path.split('/')[-1]} j={j}")
    ax.set_xlabel("time")
    ax.set_ylabel("value")
    ax.legend(frameon=False, fontsize=8)
    ax.grid(linestyle="dotted")
    out = args.out or "towers.png"
    fig.savefig(out, bbox_inches="tight", dpi=150)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
