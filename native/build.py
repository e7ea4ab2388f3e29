"""Build the native _tlabio extension in place.

Usage: python native/build.py
Compiles with the system toolchain (g++) into tlab_tpu/_tlabio*.so; the
Python I/O layer falls back to NumPy when the extension is absent.
"""
import pathlib
import subprocess
import sys
import sysconfig


def main():
    root = pathlib.Path(__file__).resolve().parent
    out_dir = root.parent / "tlab_tpu"
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = out_dir / f"_tlabio{suffix}"
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", str(root / "tlabio.cpp"), "-o", str(out), "-pthread",
    ]
    print(" ".join(cmd))
    subprocess.check_call(cmd)
    print(f"built {out}")


if __name__ == "__main__":
    main()
