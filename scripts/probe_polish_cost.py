#!/usr/bin/env python
"""Cost of the LO-RANSAC inlier polish in the motion scan.

bench_self moved 41.8 s -> 45.0 s warm between round 4 (polish absent)
and round 5 (ransac_polish_rounds=2, 79244a9).  This probe times the
full motion scan (Pallas LK + match + RANSAC + propagate) at the demo
geometry for polish_rounds in {0, 1, 2} so the e2e delta can be
attributed (or not) to the polish.

Usage: python scripts/probe_polish_cost.py
"""

import dataclasses
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
    from meshflow_tpu.motion.pipeline import (
        pair_velocity_scan,
        pair_velocity_scan_pallas,
        prepare_frames,
        use_pallas_lk,
    )
    from meshflow_tpu.utils.transfer import sync

    h, w, f = 360, 640, 64
    rng = np.random.default_rng(0)
    # textured random-walk frames so FAST finds real corners and LK tracks
    base = rng.integers(0, 256, size=(h + 32, w + 32, 3), dtype=np.uint8)
    frames = np.empty((f, h, w, 3), np.uint8)
    ox = oy = 16
    for t in range(f):
        ox = int(np.clip(ox + rng.integers(-2, 3), 0, 31))
        oy = int(np.clip(oy + rng.integers(-2, 3), 0, 31))
        frames[t] = base[oy : oy + h, ox : ox + w]
    frames = jnp.asarray(frames)
    key = jax.random.PRNGKey(0)
    scan_fn = (
        pair_velocity_scan_pallas if use_pallas_lk() else pair_velocity_scan
    )

    for rounds in (0, 1, 2):
        config = MeshFlowConfig()
        config = dataclasses.replace(config, ransac_polish_rounds=rounds)
        kps, _ = prepare_frames(frames, config)

        def run():
            vel, homo, ok = scan_fn(
                kps, frames, key, jnp.asarray(0, jnp.int32), config, h, w
            )
            sync(vel, homo, ok)

        run()  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        print(
            f"polish_rounds={rounds}: {best:6.3f} s for {f - 1} pairs "
            f"= {1000 * best / (f - 1):6.2f} ms/pair",
            flush=True,
        )


if __name__ == "__main__":
    main()
