#!/usr/bin/env python
"""On-chip 4K (3840x2160) streaming smoke + bench (BASELINE.json configs[4]).

Single chip: the point is on-hardware evidence that the 4K chunk
budgets, detect chunking, and VMEM limits hold at north-star resolution
(multi-chip sharding stays on the virtual mesh per the environment).
Runs the full streaming stabilize on the 96-frame 4K clip, cold + warm,
with per-stage seconds, and records whatever HBM statistics the device
exposes.

Prereq: python scripts/make_bench_clips.py 4k
Usage: python scripts/bench_4k.py [--out FILE]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_meshflow_bench")

CLIP = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "bench_data",
    "video-1-4k.mp4",
)


def main():
    out_file = None
    if "--out" in sys.argv:
        out_file = sys.argv[sys.argv.index("--out") + 1]

    import meshflow_tpu  # noqa: F401
    import jax
    from meshflow_tpu.api import MeshFlowStabilizer
    from meshflow_tpu.io.video import probe_video

    if not os.path.exists(CLIP):
        print("run scripts/make_bench_clips.py 4k first", file=sys.stderr)
        return 1

    info = probe_video(CLIP)
    stabilizer = MeshFlowStabilizer()
    # 36x the demo clip's pixels: small chunks keep each device execution
    # under the worker's kill threshold and bound pass-1 HBM.
    stabilizer.CHUNK = int(os.environ.get("MESHFLOW_4K_CHUNK", "8"))
    os.environ.setdefault("MESHFLOW_INFLIGHT", "1")

    def hbm():
        stats = jax.devices()[0].memory_stats() or {}
        return {
            k: stats[k]
            for k in (
                "bytes_in_use",
                "peak_bytes_in_use",
                "bytes_limit",
                "largest_alloc_size",
            )
            if k in stats
        }

    results = {}
    for run in ("cold", "warm"):
        t0 = time.perf_counter()
        metrics = stabilizer.stabilize(CLIP, "/tmp/bench-4k.mp4", 0)
        dt = time.perf_counter() - t0
        results[run] = {
            "seconds": round(dt, 2),
            "fps": round(info.num_frames / dt, 3),
            "metrics": [float(m) for m in metrics],
            "stages": {
                name: round(seconds, 2)
                for name, seconds in stabilizer.last_timer.stages
            },
            "hbm_stats": hbm(),
        }
        if out_file:
            with open(out_file + ".partial", "w") as f:
                json.dump(results, f, indent=1)

    # Serving mode (compute_metrics=False): the production configuration —
    # same warp/crop/encode, no cropping/distortion evaluation pass.
    serve_stab = MeshFlowStabilizer(compute_metrics=False)
    serve_stab.CHUNK = stabilizer.CHUNK
    t0 = time.perf_counter()
    serve_stab.stabilize(CLIP, "/tmp/bench-4k-serve.mp4", 0)
    dt = time.perf_counter() - t0
    results["serve_warm"] = {
        "seconds": round(dt, 2),
        "fps": round(info.num_frames / dt, 3),
        "stages": {
            name: round(seconds, 2)
            for name, seconds in serve_stab.last_timer.stages
        },
        "hbm_stats": hbm(),
        "note": "compute_metrics=False (no evaluation pass). The flag is "
        "part of the static config hash, so this run re-traces; identical "
        "sub-programs load from the persistent XLA cache (near-warm)",
    }
    if out_file:
        with open(out_file + ".partial", "w") as f:
            json.dump(results, f, indent=1)

    record = {
        "bench": "4K smoke (3840x2160, single chip, streaming path)",
        "frames": info.num_frames,
        "resolution": f"{info.width}x{info.height}",
        "clip_fps": info.fps,
        "chunk": stabilizer.CHUNK,
        "realtime_factor_warm": round(
            results["warm"]["fps"] / info.fps, 3
        ),
        "realtime_factor_serve_warm": round(
            results["serve_warm"]["fps"] / info.fps, 3
        ),
        **results,
    }
    print(json.dumps(record))
    if out_file:
        with open(out_file, "w") as f:
            json.dump(record, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
