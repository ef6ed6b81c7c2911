#!/usr/bin/env python
"""Decompose the Pallas LK kernel's on-chip cost at 1080p.

The 1080p30 target (BASELINE.md) is device-bound on the tracker: 42 ms/pair
motion + 74 ms/frame metric pass (scripts/profile_1080p.py).  Per-level
timings show even the tiny top level costs ~14 ms/frame, so the cost is not
just plane-area matmuls.  This probe sweeps the kernel knobs that separate
the suspects WITHOUT editing the kernel:

  max_iters  1 / 5 / 30     -> iteration-loop share
  rounds     1 / 4          -> next-patch refetch share
  block      8 / 16         -> per-block overhead share
  valid cap  64 / 512       -> feature-population share

Run on the real TPU, idle chip:
  python scripts/probe_lk_cost.py [clip] [window]
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

_args = [a for a in sys.argv[1:] if not a.startswith("--")]
CLIP = _args[0] if _args else os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "bench_data",
    "video-1-1080p.mp4",
)
WINDOW = int(_args[1]) if len(_args) > 1 else 16


def main():
    from meshflow_tpu.config import MeshFlowConfig
    from meshflow_tpu.kernels import lk_pallas
    from meshflow_tpu.motion.pipeline import (
        pack_tile_planes_u8,
        prepare_frames,
    )
    from meshflow_tpu.streaming import ChunkReader
    from meshflow_tpu.utils import grid
    from meshflow_tpu.utils.transfer import sync

    interpret = jax.default_backend() == "cpu"
    config = MeshFlowConfig()
    reader = ChunkReader(CLIP)
    frames_np = reader.read(WINDOW)
    reader.close()
    h, w = frames_np.shape[1:3]
    max_level = config.lk_max_level(h, w)
    print(f"window: {WINDOW} frames {w}x{h}, lk levels {max_level + 1}",
          flush=True)

    frames = jnp.asarray(frames_np)
    sync(frames)
    (kps, _) = prepare_frames(frames, config)
    offsets = jnp.asarray(grid.subframe_offsets(config, h, w), jnp.float32)
    local = kps.positions - offsets[None, :, None, :]
    planes, dims = pack_tile_planes_u8(frames, config, max_level)
    dims = tuple((int(r), int(c)) for r, c in dims)
    sync(planes[0])
    nvalid = np.asarray(jnp.sum(kps.valid, axis=(0,)))  # (S, K) -> per tile
    print(f"valid features/tile: mean {np.mean(np.sum(np.asarray(jnp.sum(kps.valid.astype(jnp.int32), axis=2)), axis=0)) / WINDOW:.0f} "
          f"of {kps.valid.shape[2]} slots", flush=True)

    t = WINDOW - 1

    def timed(label, fn, per):
        out = fn()
        sync(jax.tree.leaves(out)[0])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            sync(jax.tree.leaves(out)[0])
            times.append(time.perf_counter() - t0)
        tt = min(times)
        print(f"{label}: {tt:.3f}s ({tt / per * 1000:.2f} ms/pair)", flush=True)
        return tt

    def run_level(level, block=16, max_iters=30, rounds=lk_pallas.ROUNDS,
                  valid=None, pn=None):
        rows_l, cols_l = dims[level]
        pts_l = (local[:-1] / (2.0 ** level)) - 0.5
        v = kps.valid[:-1] if valid is None else valid
        if pn is None:
            pn = lk_pallas.PN_TOP if level == max_level else lk_pallas.PN_LOWER
        fn = jax.jit(
            lambda pl_, p, vv: lk_pallas.lk_level_pallas(
                pl_, pl_, p, p, vv, vv,
                rows=rows_l, cols=cols_l, shifted=True, block=block,
                max_iters=max_iters, eps=config.lk_epsilon,
                min_eig_threshold=config.lk_min_eig_threshold,
                is_level0=(level == 0), pn=pn, rounds=rounds,
                interpret=interpret,
            )
        )
        return lambda pl_=planes[level]: fn(pl_, pts_l, v)

    # level-0 decomposition (the most expensive level)
    for level in (0, max_level):
        base = timed(f"l{level} base (it30 r4 b16)", run_level(level), t)
        timed(f"l{level} it1  (fetch+setup only)",
              run_level(level, max_iters=1), t)
        timed(f"l{level} it5", run_level(level, max_iters=5), t)
        timed(f"l{level} r1   (single fetch round)",
              run_level(level, rounds=1), t)
        timed(f"l{level} it1 r1 (pure setup+1 fetch)",
              run_level(level, max_iters=1, rounds=1), t)
        timed(f"l{level} b8", run_level(level, block=8), t)
        # feature population: keep only the first 64 slots per tile
        v64 = kps.valid[:-1] & (
            jnp.arange(kps.valid.shape[2])[None, None, :] < 64
        )
        timed(f"l{level} cap64 (64 slots/tile)",
              run_level(level, valid=v64), t)
        v0 = jnp.zeros_like(kps.valid[:-1])
        timed(f"l{level} cap0  (all-invalid: grid+plane floor)",
              run_level(level, valid=v0), t)
    return 0


if __name__ == "__main__":
    sys.exit(main())
