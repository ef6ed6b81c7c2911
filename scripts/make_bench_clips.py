#!/usr/bin/env python
"""Generate the benchmark clips (bench_data/ is not tracked; rerun this).

video-1-1080p.mp4: the reference demo clip video-1 (640x360) upscaled to
1920x1080 — the BASELINE.md headline configs are 1080p30.
"""

import os

import cv2

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "bench_data")


def make_1080p():
    os.makedirs(OUT_DIR, exist_ok=True)
    out_path = os.path.join(OUT_DIR, "video-1-1080p.mp4")
    cap = cv2.VideoCapture("/root/reference/videos/video-1/video-1.m4v")
    fps = cap.get(cv2.CAP_PROP_FPS)
    writer = cv2.VideoWriter(
        out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (1920, 1080)
    )
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        writer.write(cv2.resize(frame, (1920, 1080), interpolation=cv2.INTER_CUBIC))
        n += 1
    writer.release()
    cap.release()
    print(f"{out_path}: {n} frames @ {fps:.2f} fps")


if __name__ == "__main__":
    make_1080p()
