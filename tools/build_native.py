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
OUT_DIR = os.path.join(ROOT, "subgraph_sketching_tpu", "native")
SRC = os.path.join(ROOT, "native", "seal_extract.cpp")
OUT = os.path.join(OUT_DIR, "_seal_extract.so")


def _build_one(src: str, out: str, verbose: bool) -> str:
    os.makedirs(OUT_DIR, exist_ok=True)
    init = os.path.join(OUT_DIR, "__init__.py")
    if not os.path.exists(init):
        open(init, "w").close()
    if (os.path.exists(out)
            and os.path.getmtime(out) >= os.path.getmtime(src)):
        return out
    # compile to a private temp file and atomically rename: a concurrent
    # process (multi-host shared FS, loader workers) must never dlopen a
    # half-written .so
    tmp = f"{out}.tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           "-std=c++17", src, "-o", tmp]
    if verbose:
        print(" ".join(cmd))
    try:
        subprocess.run(cmd, check=True)
        os.replace(tmp, out)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return out


def build(verbose: bool = True) -> str:
    """SEAL extraction library (kept as the historical entry point)."""
    return _build_one(SRC, OUT, verbose)


def build_plan(verbose: bool = True) -> str:
    """Segment-plan builder library (ops/segment_scan native path)."""
    return _build_one(os.path.join(ROOT, "native", "plan_build.cpp"),
                      os.path.join(OUT_DIR, "_plan_build.so"), verbose)


if __name__ == "__main__":
    print(build())
    print(build_plan())
    sys.exit(0)
