#!/usr/bin/env python
"""BASELINE.md stress benchmarks: 1080p30 end-to-end + 64x64-mesh 1080p.

Prereq: python scripts/make_bench_clips.py  (writes bench_data/).
Run on an otherwise idle host (one busy CPU core skews the
decode/warp/encode stages) with nothing else queued on the TPU.

Emits one JSON object with
  * end-to-end cold + warm runs, each with the pipeline's per-stage
    wall-clock buckets (decode / h->d / motion / solver / host warp /
    encode / metrics), and
  * a device-only pass: frames pre-resident in HBM, full motion -> solve ->
    render -> metrics on device, no wire and no host pixel work — the
    per-chip compute headroom figure the 1080p30 target is judged against.

Usage: python scripts/bench_1080p.py [--mesh64] [--out FILE]
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


def device_only_pass(stabilizer, frames_dev, h, w):
    """Time _stabilize_frames with frames already resident (device render +
    device metrics; the only pulls are scalar syncs)."""
    os.environ["MESHFLOW_RENDER"] = "device"
    try:
        t0 = time.perf_counter()
        _, cr, ds, ss = stabilizer._stabilize_frames(frames_dev, 0, h, w)
        dt = time.perf_counter() - t0
    finally:
        os.environ.pop("MESHFLOW_RENDER", None)
    return dt, (float(cr), float(ds), float(ss))


def main():
    mesh64 = "--mesh64" in sys.argv
    out_file = None
    if "--out" in sys.argv:
        out_file = sys.argv[sys.argv.index("--out") + 1]

    import numpy as np

    import meshflow_tpu  # noqa: F401
    import jax.numpy as jnp
    from meshflow_tpu.api import MeshFlowStabilizer
    from meshflow_tpu.config import MeshFlowConfig
    from meshflow_tpu.io.video import probe_video
    from meshflow_tpu.streaming import ChunkReader
    from meshflow_tpu.utils.transfer import sync

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
            "seconds": round(dt, 2),
            "fps": round(info.num_frames / dt, 3),
            "metrics": [float(m) for m in metrics],
            "stages": {
                name: round(seconds, 2)
                for name, seconds in stabilizer.last_timer.stages
            },
        }

    # Device-only: upload once (untimed), then cold + warm compute passes.
    reader = ChunkReader(CLIP)
    parts = []
    while True:
        batch = reader.read(64)
        if batch.shape[0] == 0:
            break
        part = jnp.asarray(batch)
        sync(part)
        parts.append(part)
    reader.close()
    frames_dev = jnp.concatenate(parts, axis=0)
    sync(frames_dev)
    del parts
    h, w = info.height, info.width
    device_only_pass(stabilizer, frames_dev, h, w)  # compile pass
    dt, dev_metrics = device_only_pass(stabilizer, frames_dev, h, w)
    results["device_only"] = {
        "seconds": round(dt, 2),
        "fps": round(info.num_frames / dt, 3),
        "metrics": list(dev_metrics),
        "note": "frames HBM-resident; motion+solve+render+metrics on "
        "device; no wire, no host pixel work",
    }

    record = {
        "bench": label,
        "frames": info.num_frames,
        "resolution": f"{info.width}x{info.height}",
        "clip_fps": info.fps,
        "realtime_factor_warm": round(
            results["warm"]["fps"] / info.fps, 3
        ),
        "realtime_factor_device_only": round(
            results["device_only"]["fps"] / info.fps, 3
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
