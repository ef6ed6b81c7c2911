#!/usr/bin/env python
"""Measure effective host->device rates for candidate frame layouts.

This environment's transport compresses transfers on the host CPU, so the
effective rate depends on the byte layout's compressibility, not just the
volume.  Candidates:

  bgr-interleaved  (F, H, W, 3) uint8  — what the pipeline ships today
  bgr-planar       (F, 3, H, W) uint8  — channels separated (better
                   compression if channels correlate; device would pay a
                   transpose or a planar pipeline)
  gray             (F, H, W) uint8     — the track_planes="gray" volume

Run on the real TPU with an idle chip:
  python scripts/measure_upload.py [clip] [frames]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_meshflow_bench")

import numpy as np

import meshflow_tpu  # noqa: F401
import jax.numpy as jnp

from meshflow_tpu.streaming import ChunkReader
from meshflow_tpu.utils.transfer import sync

CLIP = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "bench_data",
    "video-1-1080p.mp4",
)
N = int(sys.argv[2]) if len(sys.argv) > 2 else 64


def main():
    import cv2

    reader = ChunkReader(CLIP)
    frames = reader.read(N)
    reader.close()
    f, h, w = frames.shape[:3]
    gray = np.empty((f, h, w), np.uint8)
    for i in range(f):
        cv2.cvtColor(frames[i], cv2.COLOR_BGR2GRAY, dst=gray[i])
    planar = np.ascontiguousarray(np.moveaxis(frames, -1, 1))

    # absorb per-process device warmup before timing
    sync(jnp.ones((8, 128)))

    for label, arr in (
        ("bgr-interleaved", frames),
        ("bgr-planar", planar),
        ("gray", gray),
    ):
        # two timed reps; first may still carry residual warmup
        for rep in range(2):
            t0 = time.perf_counter()
            dev = jnp.asarray(arr)
            sync(dev)
            dt = time.perf_counter() - t0
            del dev
        mb = arr.nbytes / 2**20
        print(
            f"{label:16s} {mb:7.1f} MB  {dt:6.2f} s  "
            f"{mb / dt:6.1f} MB/s  {dt / f * 1000:6.1f} ms/frame"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
