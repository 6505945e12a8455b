"""Build the native components: `python -m fish_speech_tpu.native.build`."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

SRC = Path(__file__).parent / "pb_stream.cc"
LIB = Path(__file__).parent / "libpb_stream.so"
AV_SRC = Path(__file__).parent / "av_decode.c"
AV_LIB = Path(__file__).parent / "libav_decode.so"
FLAC_SRC = Path(__file__).parent / "flac_encode.c"
FLAC_LIB = Path(__file__).parent / "libflac_encode.so"


def build(force: bool = False) -> Path:
    if LIB.exists() and not force and LIB.stat().st_mtime >= SRC.stat().st_mtime:
        return LIB
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        str(SRC), "-o", str(LIB),
    ]
    subprocess.run(cmd, check=True)
    return LIB


def build_flac(force: bool = False) -> Path:
    """Build the native FLAC frame encoder (no external deps)."""
    if (FLAC_LIB.exists() and not force
            and FLAC_LIB.stat().st_mtime >= FLAC_SRC.stat().st_mtime):
        return FLAC_LIB
    cmd = [
        "gcc", "-O2", "-shared", "-fPIC", str(FLAC_SRC),
        "-o", str(FLAC_LIB), "-lm",
    ]
    subprocess.run(cmd, check=True)
    return FLAC_LIB


def build_av(force: bool = False) -> Path:
    """Build the ffmpeg-backed decoder shim (needs libav*-dev headers)."""
    if (AV_LIB.exists() and not force
            and AV_LIB.stat().st_mtime >= AV_SRC.stat().st_mtime):
        return AV_LIB
    cmd = [
        "gcc", "-O2", "-shared", "-fPIC", str(AV_SRC), "-o", str(AV_LIB),
        "-lavformat", "-lavcodec", "-lavutil", "-lswresample",
    ]
    subprocess.run(cmd, check=True)
    return AV_LIB


if __name__ == "__main__":
    force = "--force" in sys.argv
    print(f"Built {build(force=force)}")
    print(f"Built {build_flac(force=force)}")
    try:
        print(f"Built {build_av(force=force)}")
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"libav shim skipped ({e}); WAV/FLAC input paths unaffected")
