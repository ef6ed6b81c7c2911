#!/usr/bin/env python
"""Generate the benchmark clips (bench_data/ is not tracked; rerun this).

video-1-1080p.mp4: the reference demo clip video-1 (640x360) upscaled to
1920x1080 — the BASELINE.md headline configs are 1080p30.
video-1-4k.mp4: the first 96 frames upscaled to 3840x2160 — the
BASELINE.md 4K config's on-chip smoke (scripts/bench_4k.py).
"""

import os
import sys

import cv2

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "bench_data")


def make_scaled(name, width, height, max_frames=None):
    os.makedirs(OUT_DIR, exist_ok=True)
    out_path = os.path.join(OUT_DIR, name)
    cap = cv2.VideoCapture("/root/reference/videos/video-1/video-1.m4v")
    fps = cap.get(cv2.CAP_PROP_FPS)
    writer = cv2.VideoWriter(
        out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (width, height)
    )
    n = 0
    while max_frames is None or n < max_frames:
        ok, frame = cap.read()
        if not ok:
            break
        writer.write(
            cv2.resize(frame, (width, height), interpolation=cv2.INTER_CUBIC)
        )
        n += 1
    writer.release()
    cap.release()
    print(f"{out_path}: {n} frames @ {fps:.2f} fps")


def make_1080p():
    make_scaled("video-1-1080p.mp4", 1920, 1080)


def make_4k():
    make_scaled("video-1-4k.mp4", 3840, 2160, max_frames=96)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "1080p"):
        make_1080p()
    if which in ("all", "4k"):
        make_4k()
