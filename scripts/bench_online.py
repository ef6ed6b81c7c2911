#!/usr/bin/env python
"""Online-mode latency benchmark: p50/p90 per-frame latency of the
streaming stabilizer (BASELINE.json config: "online low-latency mode").

Usage: python scripts/bench_online.py [num_frames] [--out FILE]
"""

import json
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
    out_file = None
    argv = list(sys.argv[1:])
    if "--out" in argv:
        i = argv.index("--out")
        out_file = argv[i + 1]
        del argv[i : i + 2]
    n = int(argv[0]) if argv else 60
    frames, info = read_video("/root/reference/videos/video-1/video-1.m4v")
    frames = frames[:n]

    from meshflow_tpu.config import MeshFlowConfig

    record = {
        "bench": "online low-latency mode, 640x360 (per-frame wall clock)",
        "note": "~40 ms of each latency is this environment's tunnel RTT",
    }
    for planes in ("bgr", "gray"):
        stab = OnlineMeshFlowStabilizer(
            config=MeshFlowConfig(track_planes=planes)
        )
        latencies = []
        for frame in frames:
            t0 = time.perf_counter()
            stab.process(frame)
            # output is numpy (device pull) => true synchronization
            latencies.append(time.perf_counter() - t0)
        warm = np.array(latencies[3:]) * 1000
        record[planes] = {
            "frames": len(warm),
            "p50_ms": round(float(np.percentile(warm, 50)), 1),
            "p90_ms": round(float(np.percentile(warm, 90)), 1),
            "mean_ms": round(float(warm.mean()), 1),
            "first_frame_ms": round(latencies[1] * 1000),
        }
        print(
            f"online latency [{planes}] over {len(warm)} frames: "
            f"p50={record[planes]['p50_ms']}ms "
            f"p90={record[planes]['p90_ms']}ms "
            f"mean={record[planes]['mean_ms']}ms "
            f"(first-frame incl compile: {record[planes]['first_frame_ms']}ms)"
        )
    if out_file:
        with open(out_file, "w") as f:
            json.dump(record, f, indent=1)


if __name__ == "__main__":
    main()
