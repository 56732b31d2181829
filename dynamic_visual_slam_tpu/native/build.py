"""Build libdvsruntime.so with g++ (no external deps).

    python -m dynamic_visual_slam_tpu.native.build
"""

from __future__ import annotations

import os
import subprocess

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "runtime.cpp")
OUT = os.path.join(HERE, "libdvsruntime.so")


def build(verbose: bool = True) -> str:
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
           SRC, "-o", OUT]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


def ensure_built() -> str:
    """Build if missing or stale; returns the .so path."""
    if (not os.path.exists(OUT)
            or os.path.getmtime(OUT) < os.path.getmtime(SRC)):
        build(verbose=False)
    return OUT


if __name__ == "__main__":
    print(build())
