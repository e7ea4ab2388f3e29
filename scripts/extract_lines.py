#!/usr/bin/env python3
"""Extract 1-D lines from a flow/scal restart field into text columns
(the reference scripts/python/ExtractLines.py for this build's outputs).

Usage:
  python scripts/extract_lines.py flow.10.1 --axis y --at 64,8 \
      [--out lines.dat]
  # --axis y --at i,k  extracts field[i, :, k]; similarly x: j,k; z: i,j
"""
import argparse
import os
import sys

import numpy as np


def main(argv=None):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tlab_tpu.io.fields_io import read_field

    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("--axis", choices=("x", "y", "z"), default="y")
    ap.add_argument("--at", required=True,
                    help="the two fixed indices, comma-separated")
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)
    a, b = (int(v) for v in args.at.split(","))
    cols = []
    names = []
    for path in args.files:
        f, params, _ = read_field(path)
        line = {"x": f[:, a, b], "y": f[a, :, b],
                "z": f[a, b, :]}[args.axis]
        cols.append(np.asarray(line))
        names.append(os.path.basename(path))
    out = args.out or "lines.dat"
    np.savetxt(out, np.column_stack([np.arange(cols[0].size)] + cols),
               header=f"{args.axis}-index " + " ".join(names))
    print(f"wrote {out} ({cols[0].size} rows, {len(cols)} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
