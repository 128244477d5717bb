"""Build the native host core (libmp3rgain_native.so) with g++.

Invoked lazily from mp3rgain_tpu.native on import when the shared object is
missing or older than any source, or directly: python -m mp3rgain_tpu._native.build
"""

from __future__ import annotations

import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
SO_PATH = os.path.join(_HERE, "libmp3rgain_native.so")

SOURCES = [
    "bitstream.cpp",
    "ape.cpp",
    "mp4box.cpp",
    "mp3dec.cpp",
    "aacdec.cpp",
]

CXXFLAGS = [
    "-O3",
    "-std=c++17",
    "-fPIC",
    "-shared",
    "-Wall",
    "-Wextra",
    "-fno-exceptions",
]


def _sources() -> list[str]:
    return [
        os.path.join(_HERE, s)
        for s in SOURCES
        if os.path.exists(os.path.join(_HERE, s))
    ]


def is_stale() -> bool:
    if not os.path.exists(SO_PATH):
        return True
    so_mtime = os.path.getmtime(SO_PATH)
    deps = _sources() + [os.path.join(_HERE, "native.h")]
    return any(os.path.getmtime(p) > so_mtime for p in deps)


def build(force: bool = False) -> str:
    if not force and not is_stale():
        return SO_PATH
    # CXXFLAGS_EXTRA hook: sanitizer builds for parser fuzzing
    # (docs/security.md), e.g. CXXFLAGS_EXTRA="-fsanitize=address -g".
    extra = os.environ.get("CXXFLAGS_EXTRA", "").split()
    # The library builds lazily on the host that runs it, so tuning for
    # the local ISA is safe (AVX-512 vectorizes the decode front-ends'
    # pack/convert loops); fall back to the portable baseline if the
    # toolchain rejects the flag.
    for arch in (["-march=native"], []):
        cmd = ["g++", *CXXFLAGS, *arch, *extra, "-o", SO_PATH, *_sources()]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode == 0:
            return SO_PATH
    raise RuntimeError(
        f"native build failed:\n$ {' '.join(cmd)}\n{proc.stderr}"
    )


if __name__ == "__main__":
    build(force="--force" in sys.argv)
    print(SO_PATH)
