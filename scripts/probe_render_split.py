#!/usr/bin/env python
"""Split the 1080p device render+metrics bucket into its parts.

BENCH_1080P.json's device-only pass shows render+metrics as the dominant
bucket (27.4 s / 494 frames = 55 ms/frame BGR at mesh16).  This probe
times each component in isolation at the same shapes so optimization
effort lands on the real bound:
  * backward_map (Pallas bmap kernel) per frame
  * warp_frame (packed bilinear gather) per frame
  * crop_edges per frame
  * crop_frames (separable MXU crop+stretch) per frame
  * metric tracking (cropping_and_distortion_scanned) per frame

Usage: python scripts/probe_render_split.py [--gray] [--mesh64]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_meshflow_bench")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from meshflow_tpu.config import MeshFlowConfig
    from meshflow_tpu.metrics.quality import cropping_and_distortion_scanned
    from meshflow_tpu.motion import trackscale
    from meshflow_tpu.motion.pipeline import prepare_frames, use_pallas_lk
    from meshflow_tpu.render.stabilize import (
        backward_map,
        crop_edges,
        crop_frames,
        render_stabilized,
        warp_frame,
    )
    from meshflow_tpu.utils import grid
    from meshflow_tpu.utils.transfer import sync

    gray = "--gray" in sys.argv
    mesh64 = "--mesh64" in sys.argv
    h, w, f = 1080, 1920, 16
    config = MeshFlowConfig(
        mesh_row_count=64, mesh_col_count=64
    ) if mesh64 else MeshFlowConfig()
    if gray:
        import dataclasses

        config = dataclasses.replace(config, track_planes="gray")
    c = 1 if gray else 3

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, size=(f, h, w, c), dtype=np.uint8)
    )
    rc, cc = config.mesh_row_count, config.mesh_col_count
    unstab_grid = jnp.asarray(grid.vertex_grid(config, h, w))
    # plausible smooth displacements (a few px)
    du = jnp.asarray(
        rng.normal(0, 2.0, size=(f, rc + 1, cc + 1, 2)).astype(np.float32)
    )
    ds = jnp.asarray(
        rng.normal(0, 2.0, size=(f, rc + 1, cc + 1, 2)).astype(np.float32)
    )
    crop = jnp.asarray([40, 30, w - 41, h - 31], jnp.int32)
    border = jnp.asarray(
        [128.0] if gray else [0.0, 0.0, 0.0], jnp.float32
    )

    d_track = config.resolve_track_downscale(h, w)
    th, tw = config.track_shape(h, w)

    def to_track(fr):
        if d_track == 1:
            return fr
        if fr.shape[-1] == 3 and config.track_planes == "gray":
            return trackscale.to_track_planes_dev(fr, config)
        return trackscale.box_downscale_dev(fr, d_track)

    @jax.jit
    def bmap_only(du_, ds_):
        def body(carry, inputs):
            du1, ds1 = inputs
            stab_pos = unstab_grid + (ds1 - du1)
            bm = backward_map(stab_pos, unstab_grid, config, h, w)
            return carry, (bm.map_x[::256, ::256], bm.map_y[::256, ::256])

        _, out = jax.lax.scan(body, None, (du_, ds_))
        return out

    @jax.jit
    def bmap_warp(fr, du_, ds_):
        def body(carry, inputs):
            frame, du1, ds1 = inputs
            stab_pos = unstab_grid + (ds1 - du1)
            bm = backward_map(stab_pos, unstab_grid, config, h, w)
            return carry, warp_frame(frame, bm, border)

        _, out = jax.lax.scan(body, None, (fr, du_, ds_))
        return out

    @jax.jit
    def bmap_warp_edges(fr, du_, ds_):
        def body(carry, inputs):
            frame, du1, ds1 = inputs
            stab_pos = unstab_grid + (ds1 - du1)
            bm = backward_map(stab_pos, unstab_grid, config, h, w)
            return carry, (
                warp_frame(frame, bm, border), crop_edges(bm, h, w)
            )

        _, out = jax.lax.scan(body, None, (fr, du_, ds_))
        return out

    crop_jit = jax.jit(lambda fr: crop_frames(fr, crop, h, w))

    key = jax.random.PRNGKey(0)
    tfr = to_track(frames)
    kps, _ = prepare_frames(tfr, config)

    def metrics_only():
        r, d = cropping_and_distortion_scanned(
            kps, tfr, to_track(crop_jit(frames)),
            jax.random.fold_in(key, 2),
            jnp.asarray(0, jnp.int32), config, th, tw,
            use_pallas=use_pallas_lk(),
        )
        return r, d

    def timeit(name, fn, *args):
        out = fn(*args)
        sync(*(jax.tree.leaves(out)))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(*(jax.tree.leaves(out)))
            best = min(best, time.perf_counter() - t0)
        print(
            f"{name:28s} {best:7.3f} s  {1000 * best / f:7.2f} ms/frame",
            flush=True,
        )
        return best

    mode = ("gray" if gray else "bgr") + (" mesh64" if mesh64 else " mesh16")
    print(f"probe_render_split 1080p {mode} F={f} d_track={d_track}")
    t_bmap = timeit("bmap only", bmap_only, du, ds)
    t_warp = timeit("bmap + warp", bmap_warp, frames, du, ds)
    t_edges = timeit("bmap + warp + crop_edges", bmap_warp_edges, frames, du, ds)
    t_rs = timeit(
        "render_stabilized (shipped)",
        lambda *a: render_stabilized(*a)[0],
        frames, du, ds, unstab_grid, config, h, w,
    )
    t_crop = timeit("crop_frames", crop_jit, frames)
    t_met = timeit("metric tracking", metrics_only)
    print(
        f"derived: warp={1000 * (t_warp - t_bmap) / f:.2f} ms/frame, "
        f"edges={1000 * (t_edges - t_warp) / f:.2f} ms/frame, "
        f"total={1000 * (t_rs + t_crop + t_met) / f:.2f} ms/frame"
    )


if __name__ == "__main__":
    main()
