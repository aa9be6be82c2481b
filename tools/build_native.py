"""Build the native C++ components into shared libraries.

Usage: python tools/build_native.py
Writes: subgraph_sketching_tpu/native/_seal_extract.so

Also invoked lazily on first use (graph/native.py) with graceful fallback to
the pure-python paths when no toolchain is available.
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "native", "seal_extract.cpp")
OUT_DIR = os.path.join(ROOT, "subgraph_sketching_tpu", "native")
OUT = os.path.join(OUT_DIR, "_seal_extract.so")


def build(verbose: bool = True) -> str:
    os.makedirs(OUT_DIR, exist_ok=True)
    init = os.path.join(OUT_DIR, "__init__.py")
    if not os.path.exists(init):
        open(init, "w").close()
    if (os.path.exists(OUT)
            and os.path.getmtime(OUT) >= os.path.getmtime(SRC)):
        return OUT
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           "-std=c++17", SRC, "-o", OUT]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    print(build())
    sys.exit(0)
