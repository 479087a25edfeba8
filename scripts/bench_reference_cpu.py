"""Measure the reference-equivalent CPU baseline (honest bench denominator).

Builds native/ref_baseline.cpp (C++/OpenCV re-measurement of LEGO-SLAM's
frontend workload — see that file's header), dumps the exact bench.py frame
sequence, runs the baseline, and prints its JSON line.

Usage: python scripts/bench_reference_cpu.py
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "native", "ref_baseline.cpp")
BIN = "/tmp/legoslam_ref_baseline"
FRAMES = "/tmp/legoslam_ref_frames.bin"


def sh(cmd, **kw):
    print("+", " ".join(cmd), file=sys.stderr)
    return subprocess.run(cmd, check=True, **kw)


def main():
    cflags = subprocess.run(
        ["pkg-config", "--cflags", "opencv4"], capture_output=True, text=True, check=True
    ).stdout.split()
    libs = "opencv_core opencv_imgproc opencv_video opencv_features2d".split()
    if not os.path.exists(BIN) or os.path.getmtime(SRC) > os.path.getmtime(BIN):
        sh(["g++", "-O3", "-march=native", "-std=c++17", SRC, "-o", BIN]
           + cflags + [f"-l{l}" for l in libs])
    if not os.path.exists(FRAMES):
        sh([sys.executable, os.path.join(REPO, "scripts", "dump_bench_frames.py"), FRAMES])
    sh([BIN, FRAMES])


if __name__ == "__main__":
    main()
