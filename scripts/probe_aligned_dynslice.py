#!/usr/bin/env python
"""Probe: does this Mosaic accept DYNAMIC but 8-aligned row slices?

The LK kernel selects each feature's window rows with a one-hot MXU
contraction over the full padded plane (kernels/lk_pallas.py) because
this toolchain rejects unaligned dynamic vector loads.  If a dynamic
offset that is provably a multiple of 8 lowers, the row-select cost can
drop from O(hpad * wpad) per feature block to O((PR + 8) * wpad):
coarse 8-aligned dynamic slice, then a tiny static-size selection.

Run on the real TPU (also exercises interpret=True on CPU):
  python scripts/probe_aligned_dynslice.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_meshflow_bench")

import numpy as np

import meshflow_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


H, W = 256, 256
ROWS = 16  # rows to extract


def kernel(idx_ref, plane_ref, out_ref):
    r0 = idx_ref[0]  # dynamic feature row
    base = (r0 // 8) * 8  # provably 8-aligned
    band = plane_ref[pl.ds(base, ROWS + 8), :]  # dynamic 8-aligned load
    # fine shift within the band: static one-hot over ROWS+8 rows
    off = r0 - base  # 0..7
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (ROWS, ROWS + 8), 0) + off
        == jax.lax.broadcasted_iota(jnp.int32, (ROWS, ROWS + 8), 1)
    ).astype(jnp.float32)
    out_ref[...] = jax.lax.dot_general(
        sel, band, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def run(interpret):
    plane = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)
    idx = jnp.asarray([37], jnp.int32)
    out = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, W), jnp.float32),
        interpret=interpret,
    )(idx, plane)
    want = np.asarray(plane)[37 : 37 + ROWS]
    ok = np.array_equal(np.asarray(out), want)
    print(f"interpret={interpret}: aligned-dynamic-slice {'OK' if ok else 'WRONG'}")
    return ok


if __name__ == "__main__":
    ok = run(interpret=True)
    if jax.default_backend() != "cpu":
        try:
            ok = run(interpret=False) and ok
        except Exception as e:  # Mosaic rejection is the finding itself
            print(f"compiled mode REJECTED: {type(e).__name__}: {e}")
            ok = False
    sys.exit(0 if ok else 1)
