#!/usr/bin/env python
"""A/B the two Pallas LK fetch paths (onehot vs band) on the real chip.

Round-4 rewrote the patch fetch (one-hot full-plane selection ->
aligned dynamic band slices, block 16 -> 64) on the strength of a
microbenchmark, and the only post-rewrite e2e number was 52% slower
(VERDICT round 4).  This probe times the FULL tracker (all pyramid
levels, production entry `lk_track_pairs_pallas`) for both fetch
implementations in one process, per frame pair, at 640x360 and
optionally 1080p — the number that actually decides which path ships.

Run on the real TPU, idle chip:
  python scripts/probe_lk_ab.py [--1080p] [window]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_meshflow_bench")

import numpy as np

import meshflow_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from meshflow_tpu.kernels import _lk_pallas_band as band
from meshflow_tpu.kernels import _lk_pallas_onehot as onehot

WANT_1080P = "--1080p" in sys.argv
_args = [a for a in sys.argv[1:] if not a.startswith("--")]
WINDOW = int(_args[0]) if _args else 16


def clip_path(name):
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.join(here, "..", name)


def run_case(label, clip, results):
    from meshflow_tpu.config import MeshFlowConfig
    from meshflow_tpu.motion.pipeline import (
        frame_tiles_f32,
        prepare_frames,
    )
    from meshflow_tpu.streaming import ChunkReader
    from meshflow_tpu.utils import grid
    from meshflow_tpu.utils.transfer import sync

    interpret = jax.default_backend() == "cpu"
    config = MeshFlowConfig()
    reader = ChunkReader(clip)
    frames_np = reader.read(WINDOW)
    reader.close()
    h, w = frames_np.shape[1:3]
    max_level = config.lk_max_level(h, w)
    print(f"[{label}] {WINDOW} frames {w}x{h}, lk levels {max_level + 1}",
          flush=True)

    frames = jnp.asarray(frames_np)
    sync(frames)
    (kps, _) = prepare_frames(frames, config)
    offsets = jnp.asarray(grid.subframe_offsets(config, h, w), jnp.float32)
    local = kps.positions - offsets[None, :, None, :]
    tiles = frame_tiles_f32(frames, config)
    sync(tiles)
    t = WINDOW - 1

    for name, mod, block in (("onehot", onehot, 16), ("band", band, 64)):
        planes, dims = mod.pack_tile_planes(tiles, max_level)
        dims = tuple((int(r), int(c)) for r, c in dims)
        sync(planes[0])

        fn = jax.jit(
            lambda pl_, p, v, _m=mod, _b=block, _d=dims: _m.lk_track_pairs_pallas(
                pl_, _d, p, v, block=_b,
                max_iters=config.lk_max_iterations, eps=config.lk_epsilon,
                min_eig_threshold=config.lk_min_eig_threshold,
                interpret=interpret,
            )
        )
        tc0 = time.perf_counter()
        out = fn(planes, local, kps.valid)
        sync(out[0])
        compile_s = time.perf_counter() - tc0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(planes, local, kps.valid)
            sync(out[0])
            times.append(time.perf_counter() - t0)
        best = min(times)
        ms_pair = best / t * 1000.0
        print(f"[{label}] {name:6s} block={block}: {best:.3f}s warm "
              f"({ms_pair:.2f} ms/pair), compile {compile_s:.1f}s", flush=True)
        results[f"{label}/{name}"] = {
            "warm_s": round(best, 4),
            "ms_per_pair": round(ms_pair, 3),
            "compile_s": round(compile_s, 2),
            "block": block,
        }
        # sanity: both paths must agree on the tracked points
        if name == "onehot":
            ref = (np.asarray(out[0]), np.asarray(out[1]))
        else:
            dp = float(np.max(np.abs(np.asarray(out[0]) - ref[0])))
            ds = int(np.sum(np.asarray(out[1]) != ref[1]))
            print(f"[{label}] parity band vs onehot: max |dpt| {dp:.6f} px, "
                  f"status mismatches {ds}", flush=True)
            results[f"{label}/parity"] = {"max_dpt_px": dp,
                                          "status_mismatch": ds}


def main():
    results = {}
    run_case("640x360", clip_path("bench_data/video-1.m4v")
             if os.path.exists(clip_path("bench_data/video-1.m4v"))
             else "/root/reference/videos/video-1/video-1.m4v", results)
    if WANT_1080P:
        run_case("1080p", clip_path("bench_data/video-1-1080p.mp4"), results)
    with open("/tmp/tpu_queue/lk_ab.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
