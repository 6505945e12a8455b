"""Build the native parser: `python -m fish_speech_tpu.native.build`."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

SRC = Path(__file__).parent / "pb_stream.cc"
LIB = Path(__file__).parent / "libpb_stream.so"


def build(force: bool = False) -> Path:
    if LIB.exists() and not force and LIB.stat().st_mtime >= SRC.stat().st_mtime:
        return LIB
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        str(SRC), "-o", str(LIB),
    ]
    subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(f"Built {path}")
