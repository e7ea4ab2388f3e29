#!/usr/bin/env python3
"""Plot pdf<it>.<var> files (the reference scripts/python/PlotPdfs.py
for this build's outputs): the y-resolved PDF as a map plus the
whole-volume PDF curve.

Usage:  python scripts/plot_pdfs.py pdf10.u [--out fig.png]
"""
import argparse
import os
import sys

import numpy as np


def read_pdf(path):
    """-> (time, y (ny,), rows (ny+1, nbins+2)); the last row is the
    volume PDF, the last two columns are the bin-center range."""
    with open(path, "rb") as fh:
        time = np.fromfile(fh, "<f4", 1)[0]
        ny = int(np.fromfile(fh, "<i4", 1)[0])
        nbins = int(np.fromfile(fh, "<i4", 1)[0])
        y = np.fromfile(fh, "<f4", ny)
        rows = np.fromfile(fh, "<f4").reshape(ny + 1, nbins + 2)
    return float(time), y, rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("file")
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)
    time, y, rows = read_pdf(args.file)
    nb = rows.shape[1] - 2

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 4))
    counts = rows[:-1, :nb]
    ax1.imshow(np.log10(np.maximum(counts, 0.5)), origin="lower",
               aspect="auto",
               extent=(0, nb, float(y[0]), float(y[-1])))
    ax1.set_xlabel("bin")
    ax1.set_ylabel("y")
    ax1.set_title(f"log10 counts per plane (t={time:.4g})")
    vol = rows[-1]
    centers = np.linspace(vol[nb], vol[nb + 1], nb)
    ax2.plot(centers, vol[:nb] / max(vol[:nb].sum(), 1.0))
    ax2.set_xlabel("value")
    ax2.set_ylabel("volume PDF")
    ax2.grid(linestyle="dotted")
    out = args.out or "pdf.png"
    fig.savefig(out, bbox_inches="tight", dpi=150)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
