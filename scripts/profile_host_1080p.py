#!/usr/bin/env python
"""Host-side per-stage profile of the 1080p streaming pipeline.

No TPU required: times every host stage of the production two-pass
pipeline at 1080p on this machine's single core —

  decode      ChunkReader (libav prefetch)          pass 1 + pass 2
  maps        mf_maps C++ backward-map rasterization  pass 2
  remap       cv2.remap INTER_LINEAR (crop region)    pass 2
  resize      cv2.resize stretch back to full size    pass 2
  encode      StreamWriter (libav)                    pass 2

plus the "cpp" remap backend for comparison.  The end-to-end 1080p30
target needs the serial host work under 33.3 ms/frame (the wire and the
device pipeline overlap with it, so whichever of [host, wire, device] is
slowest sets the end-to-end rate on a given machine).

Usage: python scripts/profile_host_1080p.py [--frames N] [--out FILE]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("MESHFLOW_PLATFORM", "cpu")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

CLIP = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "bench_data",
    "video-1-1080p.mp4",
)


def main():
    n_frames = 64
    if "--frames" in sys.argv:
        n_frames = int(sys.argv[sys.argv.index("--frames") + 1])
    out_file = None
    if "--out" in sys.argv:
        out_file = sys.argv[sys.argv.index("--out") + 1]

    import meshflow_tpu  # noqa: F401
    from meshflow_tpu.config import MeshFlowConfig
    from meshflow_tpu.io.video import probe_video
    from meshflow_tpu.render import host as host_render
    from meshflow_tpu.streaming import ChunkReader, StreamWriter

    if not os.path.exists(CLIP):
        print("run scripts/make_bench_clips.py first", file=sys.stderr)
        return 1

    config = MeshFlowConfig()
    info = probe_video(CLIP)
    h, w = info.height, info.width
    record = {"resolution": f"{w}x{h}", "frames": n_frames, "stages_ms_per_frame": {}}

    def per_frame(label, seconds, n=n_frames):
        ms = seconds / n * 1000.0
        record["stages_ms_per_frame"][label] = round(ms, 2)
        print(f"{label:28s} {ms:8.2f} ms/frame", flush=True)

    # ---- decode
    reader = ChunkReader(CLIP)
    t0 = time.perf_counter()
    frames = reader.read(n_frames)
    per_frame("decode (cold reader)", time.perf_counter() - t0)
    reader.close()
    assert frames.shape[0] == n_frames, frames.shape

    # ---- synthetic but realistic displacement fields (a few px of shake,
    # smoothed) so the maps/remap work is representative
    rng = np.random.default_rng(0)
    vr, vc = config.mesh_row_count + 1, config.mesh_col_count + 1
    du = np.cumsum(rng.normal(0, 1.5, size=(n_frames, vr, vc, 2)), axis=0)
    du = du.astype(np.float32)
    kernel = np.ones(15, np.float32) / 15.0
    ds = np.apply_along_axis(
        lambda a: np.convolve(a, kernel, mode="same"), 0, du
    ).astype(np.float32)
    crop = host_render.crop_edges_host(du, ds, h, w, config)
    record["crop"] = [int(c) for c in crop]

    # ---- maps rasterization (C++), production pattern: one chunk call
    # (frame-parallel in native code) into a reused buffer (fresh
    # chunk-scale allocations pay ~20 us/page in faults)
    left, top, right, bottom = (int(v) for v in crop)
    rh, rw = bottom - top + 1, right - left + 1
    maps = np.empty((n_frames, 2, rh, rw), np.float32)
    for _ in range(2):  # warm pages + caches
        t0 = time.perf_counter()
        host_render._maps_host(
            du, ds, h, w, config,
            region=(left, top, right, bottom), out=maps,
        )
        t_maps = time.perf_counter() - t0
    per_frame("maps (C++ rasterize)", t_maps)

    # ---- cv2 remap + resize (production pattern: warm dst buffers — fresh
    # chunk-scale allocations pay ~20 us/page in faults, see render.host)
    import cv2

    border = tuple(int(c) for c in config.color_outside_image_area_bgr)
    out = np.zeros_like(frames)  # zeros: fault pages in before timing
    stab = np.zeros((rh, rw, 3), np.uint8)
    t_remap = t_resize = 0.0
    for i in range(n_frames):
        t0 = time.perf_counter()
        cv2.remap(
            frames[i], maps[i, 0], maps[i, 1], cv2.INTER_LINEAR, dst=stab,
            borderMode=cv2.BORDER_CONSTANT, borderValue=border,
        )
        t_remap += time.perf_counter() - t0
        t0 = time.perf_counter()
        cv2.resize(stab, (w, h), dst=out[i], interpolation=cv2.INTER_LINEAR)
        t_resize += time.perf_counter() - t0
    per_frame("remap (cv2, crop region)", t_remap)
    per_frame("resize (cv2 stretch)", t_resize)

    # ---- fused production call (maps + remap + resize together)
    for label in ("render_cropped_host (cold out)", "render_cropped_host (warm out)"):
        t0 = time.perf_counter()
        host_render.render_cropped_host(frames, du, ds, crop, config, out=out)
        per_frame(label, time.perf_counter() - t0)

    # ---- cpp backend for comparison
    os.environ["MESHFLOW_HOST_REMAP"] = "cpp"
    t0 = time.perf_counter()
    host_render.render_cropped_host(frames, du, ds, crop, config, out=out)
    per_frame("render_cropped_host (cpp)", time.perf_counter() - t0)
    del os.environ["MESHFLOW_HOST_REMAP"]

    # ---- encode
    writer = StreamWriter("/tmp/host-prof-1080p.mp4", w, h, info.fps, info.fourcc)
    t0 = time.perf_counter()
    writer.write(out)
    writer.close()
    per_frame("encode (libav)", time.perf_counter() - t0)

    # One decode only: pass 2 reuses pass 1's decoded batches from the
    # host frame cache (streaming.py, MESHFLOW_HOST_FRAME_CACHE_GB).
    serial = sum(
        record["stages_ms_per_frame"][k]
        for k in ("decode (cold reader)", "render_cropped_host (warm out)",
                  "encode (libav)")
    )
    record["serial_host_ms_per_frame"] = round(serial, 2)
    record["host_only_fps"] = round(1000.0 / serial, 2)
    print(f"\nserial host work: {serial:.1f} ms/frame "
          f"= {record['host_only_fps']} fps ceiling from the host alone")
    if out_file:
        with open(out_file, "w") as f:
            json.dump(record, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
