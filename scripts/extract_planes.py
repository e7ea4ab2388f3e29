#!/usr/bin/env python3
"""Extract variables from a planes<it> file into .npy arrays and an
optional quicklook image (the reference scripts/python/ExtractPlanes.py
for this build's outputs).

Usage:
  python scripts/extract_planes.py planesK.10 --axis k --shape 128,64,16 \
      --nvars 4 --nplanes 1 [--png]
"""
import argparse
import os
import sys

import numpy as np


def main(argv=None):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tlab_tpu.io.reference_formats import read_planes_file

    ap = argparse.ArgumentParser()
    ap.add_argument("file")
    ap.add_argument("--axis", choices=("i", "j", "k"), default="k")
    ap.add_argument("--shape", required=True, help="nx,ny,nz")
    ap.add_argument("--nvars", type=int, required=True)
    ap.add_argument("--nplanes", type=int, default=1)
    ap.add_argument("--png", action="store_true")
    args = ap.parse_args(argv)
    shape = tuple(int(v) for v in args.shape.split(","))
    a = read_planes_file(args.file, args.axis, shape, args.nvars,
                         args.nplanes)
    base = os.path.basename(args.file).replace(".", "_")
    for v in range(args.nvars):
        out = f"{base}_var{v}.npy"
        np.save(out, a[v])
        print(f"wrote {out} shape={a[v].shape}")
    if args.png:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, args.nvars,
                                 figsize=(3 * args.nvars, 3))
        axes = np.atleast_1d(axes)
        for v in range(args.nvars):
            axes[v].imshow(a[v, 0].T, origin="lower")
            axes[v].set_title(f"var {v}")
        fig.savefig(f"{base}.png", bbox_inches="tight", dpi=150)
        print(f"wrote {base}.png")
    return 0


if __name__ == "__main__":
    sys.exit(main())
