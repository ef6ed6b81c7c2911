#!/usr/bin/env python
"""On-chip Pallas tracker profiling: motion pass vs metric pass, and the
metric pass under (pn_lower, rounds) variants.

The metric pass is convergence-bound on heavy-crop (constant-high) configs
(PERF.md r2): features travel the full crop+stretch displacement from a
zero init (cv2 semantics the metric depends on), so they run many solver
iterations and patch-refresh rounds.  This script measures, warm and
synced, what each knob buys and what it costs in parity vs the shipped
configuration.

Run on the real TPU, idle chip:  python scripts/profile_tracker.py
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

CLIP = "/root/reference/videos/video-1/video-1.m4v"
WINDOW = 64


def main():
    import functools

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

    config = MeshFlowConfig()
    reader = ChunkReader(CLIP)
    frames_np = reader.read(WINDOW)
    reader.close()
    h, w = frames_np.shape[1:3]
    frames = jnp.asarray(frames_np)
    sync(frames)
    key = jax.random.PRNGKey(0)

    print(f"clip window: {WINDOW} frames {w}x{h}", flush=True)

    # ---- pass 1: keypoints + motion (also the motion-pass timing) -------
    kps, _ = prepare_frames(frames, config)
    sync(kps.valid)

    def time_sync(fn, n=3):
        out = fn()
        sync(jax.tree.leaves(out)[0])  # compile+warm
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            sync(jax.tree.leaves(out)[0])
            times.append(time.perf_counter() - t0)
        return out, min(times)

    (late, tracked), t_motion = time_sync(
        lambda: track_pairs_pallas(kps, frames, config, h, w)
    )
    print(f"motion tracker ({WINDOW-1} pairs): {t_motion:.3f}s "
          f"({t_motion/(WINDOW-1)*1000:.1f} ms/pair)", flush=True)

    vel, homo, ok = pair_velocity_scan_pallas(
        kps, frames, key, jnp.asarray(0, jnp.int32), config, h, w
    )
    motion = integrate_velocities(vel, homo, ok)

    unstab_grid = jnp.asarray(grid.vertex_grid(config, h, w))
    max_level = config.lk_max_level(h, w)
    offsets = jnp.asarray(grid.subframe_offsets(config, h, w), jnp.float32)

    @functools.partial(
        jax.jit, static_argnames=("dims", "pn_lower", "rounds")
    )
    def metric_track(planes_un, planes_cr, dims, pn_lower, rounds):
        local_pts = kps.positions - offsets[None, :, None, :]
        return lk_pallas.lk_track_parallel_pallas(
            planes_un,
            planes_cr,
            dims,
            local_pts,
            kps.valid,
            shifted=False,
            max_iters=config.lk_max_iterations,
            eps=config.lk_epsilon,
            min_eig_threshold=config.lk_min_eig_threshold,
            pn_lower=pn_lower,
            rounds=rounds,
        )

    # Device metric-frame derivation cost (render + crop+stretch): the
    # streaming metric pass re-renders the cropped frames on device.
    lam0 = adaptive_weights(motion.homographies, w, h, 0)
    stab0 = jacobi_smooth(
        motion.displacements, lam0,
        config.temporal_smoothing_radius,
        config.optimization_num_iterations,
    )
    crop0 = jnp.asarray(
        host_render.crop_edges_host(
            np.asarray(motion.displacements), np.asarray(stab0), h, w, config
        ),
        jnp.int32,
    )
    (stab_f0, _), t_render = time_sync(
        lambda: render_stabilized(
            frames, motion.displacements, stab0, unstab_grid, config, h, w
        )
    )
    _, t_cropres = time_sync(lambda: crop_frames(stab_f0, crop0, h, w))
    print(
        f"device render derive: warp {t_render:.3f}s + crop/stretch "
        f"{t_cropres:.3f}s for {WINDOW} frames "
        f"({(t_render+t_cropres)/WINDOW*1000:.1f} ms/frame)",
        flush=True,
    )

    for name, variant in (("original", 0), ("constant-high", 2)):
        lam = adaptive_weights(motion.homographies, w, h, variant)
        stab = jacobi_smooth(
            motion.displacements, lam,
            config.temporal_smoothing_radius,
            config.optimization_num_iterations,
        )
        crop = host_render.crop_edges_host(
            np.asarray(motion.displacements), np.asarray(stab), h, w, config
        )
        stab_f, _ = render_stabilized(
            frames, motion.displacements, stab, unstab_grid, config, h, w
        )
        cropped = crop_frames(stab_f, jnp.asarray(crop, jnp.int32), h, w)
        planes_un, dims = lk_pallas.pack_tile_planes(
            frame_tiles_f32(frames, config), max_level
        )
        planes_cr, _ = lk_pallas.pack_tile_planes(
            frame_tiles_f32(cropped, config), max_level
        )
        sync(planes_un[0], planes_cr[0])
        print(f"--- {name}: crop={crop.tolist()}", flush=True)

        base_pts = base_st = None
        for pn_lower, rounds in ((40, 4), (56, 3), (72, 2), (72, 1), (56, 4)):
            dims_t = tuple(tuple(int(v) for v in d) for d in dims)
            (pts, st), t = time_sync(
                lambda: metric_track(planes_un, planes_cr, dims_t,
                                     pn_lower, rounds)
            )
            pts_np, st_np = np.asarray(pts), np.asarray(st)
            if base_pts is None:
                base_pts, base_st = pts_np, st_np
                parity = "baseline"
            else:
                both = base_st & st_np
                dist = np.linalg.norm(pts_np - base_pts, axis=-1)
                agree = (st_np == base_st).mean()
                p95 = np.quantile(dist[both], 0.95) if both.any() else -1
                parity = f"status-agree {agree:.4f}, p95 |d| {p95:.4f} px"
            print(
                f"metric pn_lower={pn_lower} rounds={rounds}: {t:.3f}s "
                f"({t/WINDOW*1000:.1f} ms/frame)  [{parity}]",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
