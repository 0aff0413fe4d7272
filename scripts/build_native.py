"""Build the native C++ components (PNG decoder) into shared libraries.

Usage: python scripts/build_native.py
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
NATIVE = os.path.join(HERE, "..", "palette_and_histo_gan_tpu", "native")


def build():
    src = os.path.join(NATIVE, "png_decode.cpp")
    out = os.path.join(NATIVE, "libphg_png.so")
    cmd = [
        "g++",
        "-O2",
        "-shared",
        "-fPIC",
        "-std=c++17",
        src,
        "-lz",
        "-o",
        out,
    ]
    print(" ".join(cmd))
    subprocess.check_call(cmd)
    print(f"built {out}")


if __name__ == "__main__":
    sys.exit(build())
