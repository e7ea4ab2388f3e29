#!/usr/bin/env python3
"""Plot 1-D spectra files xsp<it>.<var> / zsp<it>.<var>
(the reference scripts/python/PlotSpectra.py for this build's outputs).

Usage:
  python scripts/plot_spectra.py xsp10.Euu xsp10.Evv [--ny 64]
         [--j 32 | --mean] [--out fig.png]

The binary layout is (ny, nk) float32, k fastest; ny is read from
tlab.ini's Jmax in the current directory when --ny is omitted.
"""
import argparse
import os
import sys

import numpy as np


def read_spectrum(path, ny):
    raw = np.fromfile(path, dtype="<f4")
    nk = raw.size // ny
    return raw.reshape(ny, nk)


def _ny_from_ini(ini="tlab.ini"):
    for line in open(ini):
        if line.lower().replace(" ", "").startswith("jmax="):
            return int(line.split("=", 1)[1])
    raise SystemExit("pass --ny (no Jmax found in tlab.ini)")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("--ny", type=int, default=0)
    ap.add_argument("--j", type=int, default=-1,
                    help="single y-plane index (default: mean over y)")
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)
    ny = args.ny or _ny_from_ini()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(5, 4))
    for path in args.files:
        e = read_spectrum(path, ny)
        spec = e[args.j] if args.j >= 0 else e.mean(axis=0)
        k = np.arange(1, spec.size)          # skip the mean mode
        ax.loglog(k, np.maximum(spec[1:], 1e-300),
                  label=os.path.basename(path))
    ax.set_xlabel("wavenumber index")
    ax.set_ylabel("E(k)")
    ax.legend(frameon=False)
    ax.grid(linestyle="dotted", which="both")
    out = args.out or "spectra.png"
    fig.savefig(out, bbox_inches="tight", dpi=150)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
