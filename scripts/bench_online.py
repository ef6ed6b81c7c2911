#!/usr/bin/env python
"""Online-mode latency benchmark: p50/p90 per-frame latency of the
streaming stabilizer (BASELINE.json config: "online low-latency mode").

Usage: python scripts/bench_online.py [num_frames]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_meshflow_bench")

import numpy as np

import meshflow_tpu  # noqa: E402
from meshflow_tpu.io.video import read_video  # noqa: E402
from meshflow_tpu.online import OnlineMeshFlowStabilizer  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    frames, info = read_video("/root/reference/videos/video-1/video-1.m4v")
    frames = frames[:n]
    stab = OnlineMeshFlowStabilizer()

    latencies = []
    for i, frame in enumerate(frames):
        t0 = time.perf_counter()
        out = stab.process(frame)
        # out is numpy (device_to_host pull) => true synchronization
        latencies.append(time.perf_counter() - t0)
    warm = np.array(latencies[3:]) * 1000
    print(
        f"online latency over {len(warm)} frames: "
        f"p50={np.percentile(warm, 50):.1f}ms "
        f"p90={np.percentile(warm, 90):.1f}ms "
        f"mean={warm.mean():.1f}ms "
        f"(first-frame incl compile: {latencies[1]*1000:.0f}ms)"
    )


if __name__ == "__main__":
    main()
