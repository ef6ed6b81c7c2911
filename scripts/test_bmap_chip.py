#!/usr/bin/env python
"""On-chip parity + timing of the Pallas backward-map kernel vs XLA.

Runs both implementations on random smooth warps at the demo (640x360)
and stress (1920x1080, plus 1080p/64x64-mesh) geometries: asserts maps
within 1e-3 px, coverage mismatch below 0.01%, crop edges within 1 px,
and reports warm per-frame timings for both paths.

Run on the real TPU with the chip idle:
  python scripts/test_bmap_chip.py
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

from meshflow_tpu.config import MeshFlowConfig
from meshflow_tpu.kernels.bmap_pallas import backward_map_pallas
from meshflow_tpu.render.stabilize import backward_map, crop_edges
from meshflow_tpu.utils import grid as gridmod
from meshflow_tpu.utils.transfer import sync


def run_case(mesh, h, w, scale, seed):
    os.environ["MESHFLOW_BMAP"] = "xla"
    config = MeshFlowConfig(mesh_row_count=mesh, mesh_col_count=mesh)
    rng = np.random.default_rng(seed)
    unstab = np.asarray(gridmod.vertex_grid(config, h, w), np.float32)
    stab = unstab + rng.normal(0.0, scale, unstab.shape).astype(np.float32)
    stab, unstab = jnp.asarray(stab), jnp.asarray(unstab)

    def timed(label, fn, n=3):
        out = fn()
        sync(out.map_x)
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            sync(out.map_x)
            times.append(time.perf_counter() - t0)
        print(f"  {label}: {min(times) * 1000:8.2f} ms/frame", flush=True)
        return out

    print(f"case mesh={mesh}x{mesh} {w}x{h} scale={scale}", flush=True)
    ref = timed("xla   ", lambda: backward_map(stab, unstab, config, h, w))
    out = timed(
        "pallas",
        lambda: backward_map_pallas(stab, unstab, config, h, w),
    )

    ref_cov = np.asarray(ref.covered)
    out_cov = np.asarray(out.covered)
    mismatch = float(np.mean(ref_cov != out_cov))
    both = ref_cov & out_cov
    dx = np.abs(np.asarray(out.map_x) - np.asarray(ref.map_x))[both]
    dy = np.abs(np.asarray(out.map_y) - np.asarray(ref.map_y))[both]
    ce_ref = np.asarray(crop_edges(ref, h, w))
    ce_out = np.asarray(crop_edges(out, h, w))
    print(
        f"  coverage mismatch {mismatch * 100:.4f}%  "
        f"max |dmap| {max(dx.max(initial=0), dy.max(initial=0)):.2e}  "
        f"crop diff {np.abs(ce_ref - ce_out).max()} px",
        flush=True,
    )
    assert mismatch < 1e-4, mismatch
    assert dx.max(initial=0) < 1e-3 and dy.max(initial=0) < 1e-3
    assert np.abs(ce_ref - ce_out).max() <= 1
    return True


def main():
    run_case(16, 360, 640, 2.0, 1)
    run_case(16, 1080, 1920, 6.0, 2)
    run_case(64, 1080, 1920, 4.0, 3)
    print("bmap chip parity: ALL OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
