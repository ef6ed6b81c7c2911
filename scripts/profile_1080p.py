#!/usr/bin/env python
"""On-chip per-substage profile of one 1080p streaming window.

Splits the device work the 1080p30 target depends on (BASELINE.md) into
its substages, each timed warm (min of 3 synced runs):

  prepare   gray + FAST detection          (streaming pass 1)
  tiles     frame_tiles_f32 + pack_tile_planes (tracker input packing)
  track     Pallas LK over all window pairs
  match     RANSAC/homography/propagation scan
  render    warp to stabilized frames
  crop      crop + anisotropic stretch
  mpack     metric-pass packing (unstab + cropped planes)
  mtrack    metric-pass Pallas LK (zero-init cv2 semantics)

Run on the real TPU, idle chip:
  python scripts/profile_1080p.py [--gray] [clip] [window]

--gray profiles the track_planes="gray" single-plane transport instead.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_meshflow_bench")

import numpy as np

import meshflow_tpu  # noqa: F401
import jax
import jax.numpy as jnp

GRAY = "--gray" in sys.argv
_args = [a for a in sys.argv[1:] if not a.startswith("--")]
CLIP = _args[0] if _args else os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "bench_data",
    "video-1-1080p.mp4",
)
WINDOW = int(_args[1]) if len(_args) > 1 else 32


def main():
    from meshflow_tpu.config import MeshFlowConfig
    from meshflow_tpu.kernels import lk_pallas
    from meshflow_tpu.motion.pipeline import (
        frame_tiles_f32,
        integrate_velocities,
        pair_velocity_scan_pallas,
        prepare_frames,
        track_pairs_pallas,
    )
    from meshflow_tpu.render import host as host_render
    from meshflow_tpu.render.stabilize import crop_frames, render_stabilized
    from meshflow_tpu.solver.jacobi import jacobi_smooth
    from meshflow_tpu.solver.weights import adaptive_weights
    from meshflow_tpu.streaming import ChunkReader
    from meshflow_tpu.utils import grid
    from meshflow_tpu.utils.transfer import sync
    from meshflow_tpu.metrics.quality import cropping_and_distortion_scanned

    config = MeshFlowConfig(track_planes="gray" if GRAY else "bgr")
    reader = ChunkReader(CLIP)
    frames_np = reader.read(WINDOW)
    reader.close()
    if GRAY:
        from meshflow_tpu.streaming import to_track_planes

        frames_np = to_track_planes(frames_np, config)
    h, w = frames_np.shape[1:3]
    key = jax.random.PRNGKey(0)
    max_level = config.lk_max_level(h, w)
    print(f"window: {WINDOW} frames {w}x{h} planes={config.track_planes}, "
          f"lk levels {max_level + 1}", flush=True)

    t0 = time.perf_counter()
    frames = jnp.asarray(frames_np)
    sync(frames)
    print(f"h2d upload: {time.perf_counter() - t0:.3f}s "
          f"({frames_np.nbytes / 2**20:.0f} MB)", flush=True)

    def time_sync(label, fn, per=None, n=3):
        out = fn()
        sync(jax.tree.leaves(out)[0])  # compile+warm
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            sync(jax.tree.leaves(out)[0])
            times.append(time.perf_counter() - t0)
        t = min(times)
        unit = f" ({t / per[1] * 1000:.1f} ms/{per[0]})" if per else ""
        print(f"{label}: {t:.3f}s{unit}", flush=True)
        return out, t

    (kps, _), _ = time_sync(
        "prepare (gray+FAST)", lambda: prepare_frames(frames, config),
        ("frame", WINDOW),
    )

    @jax.jit
    def pack(fr):
        return lk_pallas.pack_tile_planes(
            frame_tiles_f32(fr, config), max_level
        )

    (planes, dims), _ = time_sync(
        "tiles+pack", lambda: pack(frames), ("frame", WINDOW)
    )

    (track_out, _) = time_sync(
        "track (Pallas LK all pairs)",
        lambda: track_pairs_pallas(kps, frames, config, h, w),
        ("pair", WINDOW - 1),
    )

    _, t_full = time_sync(
        "track+match (pair_velocity_scan_pallas)",
        lambda: pair_velocity_scan_pallas(
            kps, frames, key, jnp.asarray(0, jnp.int32), config, h, w
        ),
        ("pair", WINDOW - 1),
    )

    vel, homo, ok = pair_velocity_scan_pallas(
        kps, frames, key, jnp.asarray(0, jnp.int32), config, h, w
    )
    motion = integrate_velocities(vel, homo, ok)
    lam = adaptive_weights(motion.homographies, w, h, 0)
    stab = jacobi_smooth(
        motion.displacements, lam,
        config.temporal_smoothing_radius,
        config.optimization_num_iterations,
    )
    crop = jnp.asarray(
        host_render.crop_edges_host(
            np.asarray(motion.displacements), np.asarray(stab), h, w, config
        ),
        jnp.int32,
    )
    unstab_grid = jnp.asarray(grid.vertex_grid(config, h, w))

    (render_out, _) = time_sync(
        "render (warp)",
        lambda: render_stabilized(
            frames, motion.displacements, stab, unstab_grid, config, h, w
        ),
        ("frame", WINDOW),
    )
    stab_frames = render_out[0]
    (cropped, _) = time_sync(
        "crop+stretch",
        lambda: crop_frames(stab_frames, crop, h, w),
        ("frame", WINDOW),
    )

    time_sync("mpack (cropped planes)", lambda: pack(cropped),
              ("frame", WINDOW))

    time_sync(
        "mtrack (metric pass: derive+pack+track)",
        lambda: cropping_and_distortion_scanned(
            kps, frames, cropped, jax.random.fold_in(key, 2),
            jnp.asarray(0, jnp.int32), config, h, w, use_pallas=True,
        ),
        ("frame", WINDOW),
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
