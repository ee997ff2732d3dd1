"""Build the native library (g++ → ``lib/gf_native.so``).

Run directly (``python -m geneface_tpu.native.build``) or let
``geneface_tpu.native`` trigger it lazily on first import. No external build
system needed — the library is a single translation unit.
"""

from __future__ import annotations

import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_HERE, "src", "gf_native.cpp")
LIB_DIR = os.path.join(_HERE, "lib")
LIB = os.path.join(LIB_DIR, "gf_native.so")


def build(quiet: bool = False) -> str:
    """Compile if the .so is missing or older than the source; returns path."""
    if os.path.exists(LIB) and os.path.getmtime(LIB) >= os.path.getmtime(SRC):
        return LIB
    os.makedirs(LIB_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread", "-Wall",
        SRC, "-o", LIB + ".part",
    ]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        if not quiet:
            sys.stderr.write(res.stderr)
        raise RuntimeError(f"gf_native build failed: {res.stderr[-2000:]}")
    os.replace(LIB + ".part", LIB)
    return LIB


if __name__ == "__main__":
    print(build())
