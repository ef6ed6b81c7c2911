#!/usr/bin/env python
"""On-chip microbench of the pair-scan's pixel preprocessing at 1080p.

The round-3 profile (memory: 6.4 s / 32-frame 1080p window = 207 ms/pair
vs 17.4 ms/pair at 640x360) said the tracker's cost scales with pixels,
not features.  This script splits the preprocessing into its individual
ops so the dominant one is measurable, then times candidate
restructurings against the production pack:

  moveaxis    u8 (F,H,W,C) -> (F,C,H,W) relayout alone
  split       split_tiles on f32 channels
  split_u8    split_tiles on u8 channels (4x less traffic)
  pyr_l<k>    each pyrDown level
  pad+cast    reflect_pad_level + uint8 cast per level
  pack        legacy frame_tiles_f32 + pack_tile_planes (one jit)
  pack_u8     production pack_tile_planes_u8 (u8-native level 0),
              bit-compared to `pack`
  lk_only     lk_track_pairs_pallas on prebuilt planes (pure kernel)
  lk_l<k>     one lk_level_pallas call per pyramid level

Run on the real TPU with the chip idle:
  python scripts/profile_preproc.py [--gray] [clip] [window]
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
    from meshflow_tpu.kernels.pyramid import build_pyramid, pyr_down
    from meshflow_tpu.motion.pipeline import (
        frame_tiles_f32,
        prepare_frames,
        split_tiles,
    )
    from meshflow_tpu.streaming import ChunkReader
    from meshflow_tpu.utils import grid
    from meshflow_tpu.utils.transfer import sync

    interpret = jax.default_backend() == "cpu"  # CPU smoke-test mode
    config = MeshFlowConfig(track_planes="gray" if GRAY else "bgr")
    reader = ChunkReader(CLIP)
    frames_np = reader.read(WINDOW)
    reader.close()
    if GRAY:
        from meshflow_tpu.streaming import to_track_planes

        frames_np = to_track_planes(frames_np, config)
    h, w = frames_np.shape[1:3]
    max_level = config.lk_max_level(h, w)
    print(
        f"window: {WINDOW} frames {w}x{h} planes={config.track_planes}, "
        f"lk levels {max_level + 1}",
        flush=True,
    )

    frames = jnp.asarray(frames_np)
    sync(frames)

    def time_sync(label, fn, n=3):
        out = fn()
        sync(jax.tree.leaves(out)[0])  # compile + per-process warmup
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            sync(jax.tree.leaves(out)[0])
            times.append(time.perf_counter() - t0)
        t = min(times)
        print(f"{label:>12}: {t * 1000:8.1f} ms  ({t / WINDOW * 1000:6.2f} ms/frame)",
              flush=True)
        return out, t

    # --- individual preprocessing ops -------------------------------------
    mv = jax.jit(lambda fr: jnp.moveaxis(fr, -1, 1))
    (chans_u8, _) = time_sync("moveaxis", lambda: mv(frames))

    spl = jax.jit(lambda c: split_tiles(c.astype(jnp.float32), config))
    time_sync("split", lambda: spl(chans_u8))
    spl8 = jax.jit(lambda c: split_tiles(c, config))
    (tiles_u8, _) = time_sync("split_u8", lambda: spl8(chans_u8))

    tiles_f32 = jax.jit(
        lambda fr: frame_tiles_f32(fr, config)
    )(frames)
    sync(tiles_f32)

    lvl = tiles_f32
    for k in range(max_level):
        pd = jax.jit(pyr_down)
        (lvl, _) = time_sync(f"pyr_l{k + 1}", lambda lv=lvl: pd(lv))

    levels = build_pyramid(tiles_f32, max_level)
    for k, lv in enumerate(levels):
        pc = jax.jit(
            lambda x: lk_pallas.reflect_pad_level(x).astype(jnp.uint8)
        )
        time_sync(f"pad+cast l{k}", lambda x=lv: pc(x))

    # --- production pack (what track_pairs_pallas runs) --------------------
    from meshflow_tpu.kernels.pyramid import pyramid_shapes

    tile_h, tile_w = config.subframe_shape(h, w)
    dims = tuple(pyramid_shapes(tile_h, tile_w, max_level))
    pack = jax.jit(
        lambda fr: lk_pallas.pack_tile_planes(
            frame_tiles_f32(fr, config), max_level
        )[0]
    )
    (planes, t_pack) = time_sync("pack", lambda: pack(frames))

    # --- candidate: u8-native level 0 --------------------------------------
    def pack_u8(fr):
        chans = jnp.moveaxis(fr, -1, 1)  # u8 (F, C, H, W)
        t8 = jnp.swapaxes(split_tiles(chans, config), 1, 2)  # (F,S,C,th,tw)
        lvl0 = lk_pallas.reflect_pad_level(t8)
        planes2 = [lvl0]
        cur = t8.astype(jnp.float32)
        for _ in range(max_level):
            cur = pyr_down(cur)
            planes2.append(
                lk_pallas.reflect_pad_level(cur).astype(jnp.uint8)
            )
        return tuple(planes2)

    (planes2, t_pack8) = time_sync("pack_u8", lambda: jax.jit(pack_u8)(frames))
    same = all(
        bool(jnp.all(a == b)) for a, b in zip(planes, planes2)
    )
    print(f"pack_u8 bit-identical to pack: {same}", flush=True)

    # --- pure kernel time ---------------------------------------------------
    (kps, _) = prepare_frames(frames, config)
    offsets = jnp.asarray(
        grid.subframe_offsets(config, h, w), jnp.float32
    )
    local = kps.positions - offsets[None, :, None, :]

    lk = jax.jit(
        lambda pl_, pts, val: lk_pallas.lk_track_pairs_pallas(
            pl_, dims, pts, val,
            max_iters=config.lk_max_iterations,
            eps=config.lk_epsilon,
            min_eig_threshold=config.lk_min_eig_threshold,
            interpret=interpret,
        )
    )
    time_sync("lk_only", lambda: lk(planes, local, kps.valid))

    # --- per-level kernel time ---------------------------------------------
    t = WINDOW - 1
    for level in range(max_level, -1, -1):
        rows_l, cols_l = dims[level]
        pts_l = (local[:-1] / (2.0 ** level)) - 0.5
        blk = 16
        lvl_fn = jax.jit(
            lambda pl_, p, v, lev=level, r=rows_l, c=cols_l: lk_pallas.lk_level_pallas(
                pl_, pl_, p, p, v, v,
                rows=r, cols=c, shifted=True, block=blk,
                max_iters=config.lk_max_iterations,
                eps=config.lk_epsilon,
                min_eig_threshold=config.lk_min_eig_threshold,
                is_level0=(lev == 0),
                pn=lk_pallas.PN_TOP if lev == max_level else lk_pallas.PN_LOWER,
                interpret=interpret,
            )
        )
        time_sync(
            f"lk_l{level}",
            lambda pl_=planes[level], p=pts_l, v=kps.valid[:-1]: lvl_fn(pl_, p, v),
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
