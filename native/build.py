"""Build the native extensions in place.

Usage: python native/build.py
Compiles with the system toolchain (g++/cc) into tlab_tpu/:
  - _tlabio<EXT>.so  -- threaded field I/O engine (tlabio.cpp)
  - _nrrand.so       -- reference-exact NR ran0/rang batch RNG (nrrand.c)
The Python layers fall back to NumPy / pure Python when absent.
"""
import pathlib
import subprocess
import sys
import sysconfig


def main():
    root = pathlib.Path(__file__).resolve().parent
    out_dir = root.parent / "tlab_tpu"
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    include = sysconfig.get_paths()["include"]

    builds = [
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
         f"-I{include}", str(root / "tlabio.cpp"),
         "-o", str(out_dir / f"_tlabio{suffix}"), "-pthread"],
        ["gcc", "-O2", "-shared", "-fPIC", str(root / "nrrand.c"),
         "-o", str(out_dir / "_nrrand.so"), "-lm"],
    ]
    for cmd in builds:
        print(" ".join(cmd))
        subprocess.check_call(cmd)
    print("native extensions built")


if __name__ == "__main__":
    main()
