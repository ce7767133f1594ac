"""Build the native fast-ops shared library with g++.

Usage: python -m minivectordb_tpu.native.build
Produces native/libfastops.so next to fastops.cpp. Optional — pure-Python
fallbacks cover everything when the library is absent.
"""

from __future__ import annotations

import os
import subprocess
import sys


def build() -> str | None:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "fastops.cpp")
    out = os.path.join(here, "libfastops.so")
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        src,
        "-o",
        out,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        print(f"fastops build failed (pure-Python fallbacks remain): {msg}",
              file=sys.stderr)
        return None
    return out


if __name__ == "__main__":
    path = build()
    if path:
        print(f"built {path}")
        sys.exit(0)
    sys.exit(1)
