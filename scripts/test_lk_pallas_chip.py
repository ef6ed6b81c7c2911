#!/usr/bin/env python
"""On-chip check: Pallas LK vs the XLA lk_track (cv2-oracle-tested).

Run on the real TPU:  python scripts/test_lk_pallas_chip.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_meshflow_tests")

import numpy as np

import meshflow_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from meshflow_tpu.kernels import lk as lk_xla
from meshflow_tpu.kernels import lk_pallas
from meshflow_tpu.kernels.pyramid import build_pyramid, pyramid_shapes


def main():
    # C=3 is the reference-parity BGR mode; C=1 exercises the
    # track_planes="gray" single-plane path through the same kernel.
    ok = all(run_case(c) for c in (3, 1))
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


def run_case(C):
    rng = np.random.default_rng(7)
    F, S, K = 3, 2, 64
    TH, TW = 90, 160
    max_level = 2
    print(f"---- C={C}")

    # smooth trackable frames: blurred noise, shifted per frame
    base = rng.integers(0, 256, (C, TH + 40, TW + 40)).astype(np.float32)
    for _ in range(2):
        for ax in (1, 2):
            base = (
                0.25 * np.roll(base, 1, ax) + 0.5 * base + 0.25 * np.roll(base, -1, ax)
            )
    frames = np.zeros((F, S, C, TH, TW), np.float32)
    shifts = [(0, 0), (3, -5), (7, -9)]
    for t, (dy, dx) in enumerate(shifts):
        for s in range(S):
            oy, ox = 15 + dy + 3 * s, 15 + dx - 2 * s
            frames[t, s] = base[:, oy : oy + TH, ox : ox + TW]
    frames_u8 = np.round(frames).astype(np.uint8).astype(np.float32)

    pts = np.stack(
        [
            rng.uniform(12, TW - 12, (F, S, K)),
            rng.uniform(12, TH - 12, (F, S, K)),
        ],
        axis=-1,
    ).astype(np.float32)
    valid = rng.random((F, S, K)) < 0.9

    # ---- XLA oracle -----------------------------------------------------
    def build_levels_xla(frame_cs):  # (C, TH, TW)
        return tuple(
            lk_xla.prepare_level(lvl)
            for lvl in build_pyramid(jnp.asarray(frame_cs), max_level)
        )

    t0 = time.perf_counter()
    xla_pts = np.zeros((F - 1, S, K, 2), np.float32)
    xla_st = np.zeros((F - 1, S, K), bool)
    for t in range(F - 1):
        for s in range(S):
            pl_prev = build_levels_xla(frames_u8[t, s])
            pl_next = build_levels_xla(frames_u8[t + 1, s])
            p, st = lk_xla.lk_track(
                pl_prev,
                pl_next,
                jnp.asarray(pts[t, s]),
                jnp.asarray(valid[t, s]),
            )
            xla_pts[t, s] = np.asarray(p)
            xla_st[t, s] = np.asarray(st)
    print(f"xla done {time.perf_counter()-t0:.1f}s")

    # ---- Pallas ---------------------------------------------------------
    levels = build_pyramid(jnp.asarray(frames_u8), max_level)  # (F,S,C,h,w)
    dims = pyramid_shapes(TH, TW, max_level)
    planes = tuple(
        np.asarray(lk_pallas.reflect_pad_level(lvl)).astype(np.uint8)
        for lvl in levels
    )
    t0 = time.perf_counter()
    pp, pst = lk_pallas.lk_track_pairs_pallas(
        tuple(jnp.asarray(p) for p in planes),
        tuple(dims),
        jnp.asarray(pts),
        jnp.asarray(valid),
        block=16,
    )
    pp = np.asarray(pp)
    pst = np.asarray(pst)
    print(f"pallas done {time.perf_counter()-t0:.1f}s")

    both = xla_st & pst
    dist = np.linalg.norm(xla_pts - pp, axis=-1)
    v = valid[:-1]
    print(
        f"status agree: {(xla_st == pst)[v].mean():.4f}  "
        f"both-ok: {both[v].mean():.4f}"
    )
    if both.any():
        print(
            f"endpoint |diff| on both-ok: median {np.median(dist[both]):.4f} "
            f"p95 {np.quantile(dist[both], 0.95):.4f} max {dist[both].max():.4f}"
        )
    ok = (xla_st == pst)[v].mean() > 0.97 and np.quantile(dist[both], 0.95) < 0.1
    print("case PASS" if ok else "case FAIL")
    return ok


if __name__ == "__main__":
    raise SystemExit(main())
