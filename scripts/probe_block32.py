#!/usr/bin/env python
"""Probe: does lk_level_pallas compile and run at block=32 (and 24)?

PERF.md (r2) records block=16 as the optimum with "32 fails Mosaic stack
allocation".  The r3 preproc profile shows the tracker is per-iteration
overhead-bound (level cost nearly independent of plane size), so larger
blocks amortize that overhead ~linearly; the block-skew study measured
only ~14% block-max iteration inflation at 32.  This probe reproduces
the failure (or times the win) at the shipped geometries.

Run on the real TPU, idle chip:  python scripts/probe_block32.py
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

from meshflow_tpu.kernels import lk_pallas
from meshflow_tpu.utils.transfer import sync


def run_case(label, rows, cols, pairs, tiles, k, block, pn, is_level0, ch=3):
    pad = lk_pallas.PAD
    hpad, wpad = rows + 2 * pad, cols + 2 * pad
    rng = np.random.default_rng(0)
    planes = jnp.asarray(
        rng.integers(0, 256, (pairs + 1, tiles, ch, hpad, wpad), np.uint8)
    )
    pts = jnp.asarray(
        rng.uniform(5, min(rows, cols) - 5, (pairs, tiles, k, 2)), jnp.float32
    )
    guess = pts + jnp.asarray(
        rng.normal(0, 3.0, (pairs, tiles, k, 2)), jnp.float32
    )
    valid = jnp.ones((pairs, tiles, k), bool)

    def fn():
        return lk_pallas.lk_level_pallas(
            planes, planes, pts, guess, valid, valid,
            rows=rows, cols=cols, shifted=True, block=block,
            is_level0=is_level0, pn=pn,
        )

    try:
        out = fn()
        sync(out[0])
    except Exception as e:
        msg = str(e).splitlines()[0][:180]
        print(f"{label} block={block}: FAIL {type(e).__name__}: {msg}", flush=True)
        return None
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn()
        sync(out[0])
        times.append(time.perf_counter() - t0)
    t = min(times)
    print(
        f"{label} block={block}: OK  {t * 1000:8.2f} ms "
        f"({t / pairs * 1000:6.2f} ms/pair)",
        flush=True,
    )
    return np.asarray(out[0]), np.asarray(out[1])


def main():
    # 640x360 tile geometry: 16 tiles of 160x90, K=512 per tile.
    # Use fewer tiles/pairs to keep probe time bounded; relative block
    # timing is what matters.
    for block in (16, 32, 64):
        run_case("360p-tile L0", 90, 160, 8, 16, 512, block,
                 lk_pallas.PN_LOWER, True)
    # compare tracked outputs 16 vs 32 for exactness
    a = run_case("360p-tile L0", 90, 160, 2, 4, 64, 16, lk_pallas.PN_LOWER, True)
    b = run_case("360p-tile L0", 90, 160, 2, 4, 64, 32, lk_pallas.PN_LOWER, True)
    if a is not None and b is not None:
        d = np.abs(a[0] - b[0]).max()
        st = (a[1] == b[1]).mean()
        print(f"16-vs-32 parity: max |dpts| {d:.2e}, status agree {st:.4f}",
              flush=True)
    # 1080p tile geometry: 16 tiles of 480x270.
    for block in (16, 32):
        run_case("1080p-tile L0", 270, 480, 4, 16, 512, block,
                 lk_pallas.PN_LOWER, True)
    # top level with the wide patch (worst VMEM case)
    for block in (16, 32):
        run_case("360p-tile top", 12, 20, 8, 16, 512, block,
                 lk_pallas.PN_TOP, False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
