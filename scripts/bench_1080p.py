#!/usr/bin/env python
"""BASELINE.md stress benchmarks: 1080p30 end-to-end + 64x64-mesh 1080p.

Prereq: python scripts/make_bench_clips.py  (writes bench_data/).
Writes PERF.md-ready JSON lines to stdout; run on an otherwise idle host
(one busy CPU core skews the decode/warp/encode stages).

Usage: python scripts/bench_1080p.py [--mesh64] [--frames N]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_meshflow_bench")

CLIP = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "bench_data",
    "video-1-1080p.mp4",
)


def main():
    mesh64 = "--mesh64" in sys.argv

    import meshflow_tpu  # noqa: F401
    from meshflow_tpu.api import MeshFlowStabilizer
    from meshflow_tpu.config import MeshFlowConfig
    from meshflow_tpu.io.video import probe_video

    if not os.path.exists(CLIP):
        print("run scripts/make_bench_clips.py first", file=sys.stderr)
        return 1

    info = probe_video(CLIP)
    config = None
    label = "1080p30 default 16x16 mesh"
    if mesh64:
        config = MeshFlowConfig(mesh_row_count=64, mesh_col_count=64)
        label = "1080p30 64x64 mesh stress"

    stabilizer = MeshFlowStabilizer(config=config)
    # 9x the pixels of the demo clips: smaller frame chunks keep each
    # device execution under the worker's kill threshold.
    stabilizer.CHUNK = int(os.environ.get("MESHFLOW_1080P_CHUNK", "32"))
    out = "/tmp/bench-1080p.mp4"
    results = {}
    for run in ("cold", "warm"):
        t0 = time.perf_counter()
        metrics = stabilizer.stabilize(CLIP, out, 0)
        dt = time.perf_counter() - t0
        results[run] = {
            "seconds": dt,
            "fps": info.num_frames / dt,
            "metrics": [float(m) for m in metrics],
        }
    print(
        json.dumps(
            {
                "bench": label,
                "frames": info.num_frames,
                "resolution": f"{info.width}x{info.height}",
                "clip_fps": info.fps,
                "realtime_factor_warm": results["warm"]["fps"] / info.fps,
                **results,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
