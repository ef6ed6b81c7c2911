#!/usr/bin/env python
"""Probe: scalar reads from VMEM at dynamic indices (vector->scalar handoff).

The dynslice fetch redesign needs per-feature scalar band bases derived
from the iteration loop's corner VECTORS.  Candidate handoff: store the
(B, 2) corner vector to a VMEM scratch (vector store), then per-feature
scalar-load `scratch[i, 0]`, floor to i32, align with //8*8, dynslice.

Also probes the same via SMEM scratch stores (scalar stores to SMEM are
legal) in case VMEM scalar loads are rejected.

Run: python scripts/probe_scalar_from_vmem.py
"""

import os
import sys
import functools

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_meshflow_bench")

import numpy as np

import meshflow_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 64, 256
B = 8
ROWS = 16


def kernel(plane_ref, corners_ref, out_ref, vec_s):
    # in-kernel vector math producing the bases (simulates the iter loop)
    vec_s[...] = corners_ref[...] * 2.0 + 1.0  # (B, 128) f32, col 0 = row base

    def body(i, _):
        base_f = vec_s[i, 0]  # scalar load from VMEM at dynamic index
        base = (jnp.floor(base_f).astype(jnp.int32) // 8) * 8
        band = plane_ref[pl.ds(base, ROWS), :]
        out_ref[i] = band[0:1, :]
        return 0

    jax.lax.fori_loop(0, B, body, 0)


def main():
    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.random((H, W), np.float32))
    corners = jnp.asarray(
        np.pad(rng.integers(0, (H - ROWS) // 2, (B, 1)).astype(np.float32),
               ((0, 0), (0, 127))),
    )
    fn = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, 128), jnp.float32)],
    )
    out = np.asarray(fn(plane, corners))
    want = np.stack(
        [
            np.asarray(plane)[
                (int(np.floor(float(corners[i, 0]) * 2 + 1)) // 8) * 8
            ][None]
            for i in range(B)
        ]
    )
    ok = np.array_equal(out, want)
    print(f"VMEM scalar-load handoff: {'OK' if ok else 'WRONG'}")
    return 0 if ok else 1


if __name__ == "__main__":
    try:
        rc = main()
    except Exception as e:
        print(f"REJECTED: {type(e).__name__}: {str(e)[:500]}")
        rc = 1
    sys.exit(rc)
