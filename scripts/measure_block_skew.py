#!/usr/bin/env python
"""Measure LK iteration-count skew inside the Pallas tracker's 16-feature
blocks, and what displacement-sorted blocking would save.

The Pallas tracker (kernels/lk_pallas.py) iterates each 16-feature block
until ALL its features converge, so a block's cost is max(per-feature
iterations).  Features land in blocks by FAST score order — uncorrelated
with convergence difficulty.  On the metric pass (unstabilized frame vs
cropped frame, zero init per cv2 semantics) per-feature difficulty is
strongly predicted by the analytic crop+stretch displacement at the
feature position — a sort key available BEFORE tracking.

This script runs the real metric-pass scenario on CPU with the XLA
oracle tracker instrumented to report per-feature per-level iteration
counts, then compares sum-over-blocks-of-max costs for (a) the current
score order and (b) blocks formed after sorting by the analytic key.

Run (CPU, ~2-4 min):  python scripts/measure_block_skew.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_meshflow_tests")

import numpy as np

import meshflow_tpu  # noqa: F401
import jax
import jax.numpy as jnp

CLIP = "/root/reference/videos/video-1/video-1.m4v"
WINDOW = 24
FRAMES_TO_MEASURE = (0, 8, 16)
BLOCK = int(__import__("os").environ.get("SKEW_BLOCK", "16"))


def main():
    from meshflow_tpu.config import MeshFlowConfig
    from meshflow_tpu.kernels.lk import lk_track
    from meshflow_tpu.motion.pipeline import (
        estimate_motion_scanned,
        packed_tile_pyramids,
        prepare_frames,
        unpack_level,
    )
    from meshflow_tpu.render import host as host_render
    from meshflow_tpu.render.stabilize import crop_frames, render_stabilized
    from meshflow_tpu.solver.jacobi import jacobi_smooth
    from meshflow_tpu.solver.weights import adaptive_weights
    from meshflow_tpu.streaming import ChunkReader
    from meshflow_tpu.utils import grid

    config = MeshFlowConfig()
    reader = ChunkReader(CLIP)
    frames_np = reader.read(WINDOW)
    reader.close()
    h, w = frames_np.shape[1:3]
    frames = jnp.asarray(frames_np)
    key = jax.random.PRNGKey(0)

    kps, _ = prepare_frames(frames, config)
    motion = estimate_motion_scanned(kps, frames, key, config, h, w)

    # constant-high: the convergence-bound variant (largest crops)
    lam = adaptive_weights(motion.homographies, w, h, 2)
    stab = jacobi_smooth(
        motion.displacements, lam,
        config.temporal_smoothing_radius,
        config.optimization_num_iterations,
    )
    crop = host_render.crop_edges_host(
        np.asarray(motion.displacements), np.asarray(stab), h, w, config
    )
    unstab_grid = jnp.asarray(grid.vertex_grid(config, h, w))
    stab_f, _ = render_stabilized(
        frames, motion.displacements, stab, unstab_grid, config, h, w
    )
    cropped = crop_frames(stab_f, jnp.asarray(crop, jnp.int32), h, w)
    print(f"crop rect (l,t,r,b) = {crop.tolist()}  frame {w}x{h}", flush=True)

    l, t, r, b = [float(v) for v in crop]
    max_level = config.lk_max_level(h, w)
    packed_un = packed_tile_pyramids(frames, config, max_level)
    packed_cr = packed_tile_pyramids(cropped, config, max_level)

    def track_used(tile_prev, tile_next, pts, valid):
        return lk_track(
            tile_prev, tile_next, pts, valid,
            win_size=config.lk_window_size,
            max_iters=config.lk_max_iterations,
            eps=config.lk_epsilon,
            min_eig_threshold=config.lk_min_eig_threshold,
            collect_used=True,
        )

    tot_natural = tot_sorted = tot_oracle = tot_flat = 0
    nlv = max_level + 1
    for t_idx in FRAMES_TO_MEASURE:
        kps_t = jax.tree.map(lambda a: a[t_idx], kps)
        un_lv = tuple(unpack_level(pk, t_idx) for pk in packed_un)
        cr_lv = tuple(unpack_level(pk, t_idx) for pk in packed_cr)
        # vmap over tiles (axis 1 of levels, axis 0 of kps)
        _, _, used = jax.vmap(
            track_used, in_axes=(1, 1, 0, 0)
        )(un_lv, cr_lv, kps_t.positions
          - jnp.asarray(grid.subframe_offsets(config, h, w), jnp.float32)[:, None, :],
          kps_t.valid)
        used = np.asarray(used)  # (S, K, L)
        pos = np.asarray(kps_t.positions)  # (S, K, 2)
        valid = np.asarray(kps_t.valid)
        used = used * valid[..., None]

        # analytic crop+stretch displacement magnitude (sort key)
        dx = (pos[..., 0] - l) * (w / max(r - l, 1.0)) - pos[..., 0]
        dy = (pos[..., 1] - t) * (h / max(b - t, 1.0)) - pos[..., 1]
        key_mag = np.hypot(dx, dy)
        # push invalid slots to the end so they pad the last blocks
        key_mag = np.where(valid, key_mag, np.inf)

        s, k, _ = used.shape
        nb = k // BLOCK

        def block_cost(order):  # order: (S, K) permutation per tile
            cost = 0
            for si in range(s):
                u = used[si][order[si]].reshape(nb, BLOCK, nlv)
                cost += u.max(axis=1).sum()
            return int(cost)

        natural = np.tile(np.arange(k), (s, 1))
        by_key = np.argsort(key_mag, axis=1, kind="stable")
        by_true = np.argsort(
            np.where(valid, -used.sum(-1), np.inf), axis=1, kind="stable"
        )
        c_nat = block_cost(natural)
        c_key = block_cost(by_key)
        c_true = block_cost(by_true)
        flat = int(used.sum(axis=(0, 1)).max(initial=0))  # unblocked lower-ish ref
        tot_natural += c_nat
        tot_sorted += c_key
        tot_oracle += c_true
        tot_flat += int(used.reshape(-1, nlv).max(axis=0).sum())
        print(
            f"frame {t_idx}: sum-over-blocks max-iters  "
            f"natural {c_nat}  key-sorted {c_key} ({c_key/c_nat:.2f}x)  "
            f"oracle-sorted {c_true} ({c_true/c_nat:.2f}x)",
            flush=True,
        )

    print(
        f"TOTAL: natural {tot_natural}  key-sorted {tot_sorted} "
        f"({tot_sorted/tot_natural:.2f}x)  oracle {tot_oracle} "
        f"({tot_oracle/tot_natural:.2f}x)",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
